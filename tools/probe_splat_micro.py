#!/usr/bin/env python
"""On-chip micro-attribution of the static-plan splat's ~10 ms in-graph cost.

The ablation probe (tools/probe_lss_ablate.py) puts the lift/splat marginal
at ~10.4 ms while its HBM speed-of-light is well under 1 ms — so the cost is
in the *lowering* of one of its pieces, not in bytes. This probe times each
piece cumulatively with the REAL flagship plan (host-computed ranks, same
compaction/padding as bench.py):

    feat row-gather -> +dp gather*mul -> +group-8 pre-reduce
    -> seg reduction vs cumsum-bounds reduction vs full lift_splat_static

Usage: python tools/probe_splat_micro.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.probe_view import dispatch_overhead, timeit  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    B, fH, fW, D, C_tr = 1, 48, 160, 112, 128
    grid = (128, 128, 16)
    nvox = int(np.prod(grid))
    npix = fH * fW

    from bench import make_flagship_batch
    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.splat_plan import (
        build_plan, compute_ranks_host, plan_bounds,
    )
    from stereoscene_tpu.ops.voxel_pool import (
        lift_splat_static, segment_sum_bounds,
    )

    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    batch = make_flagship_batch(cfg, 1, dtype=jnp.float32)
    geo = {k: np.asarray(batch[k])
           for k in ("rots", "trans", "intrins", "post_rots", "post_trans",
                     "bda")}
    ranks_np = compute_ranks_host(model, geo)

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    dp = jnp.asarray(rng.rand(D, fH, fW).astype(np.float32))
    feat32 = jnp.asarray(rng.randn(npix, C_tr).astype(np.float32))
    feat16 = feat32.astype(jnp.bfloat16)

    for group in (1, 8):
        order_np, rs_np = build_plan(ranks_np, nvox, group=group)
        bd_np = plan_bounds(rs_np, nvox, group=group)
        od = jnp.asarray(order_np)
        rk = jnp.asarray(rs_np)
        bd = jnp.asarray(bd_np)
        p_pad = len(order_np)
        print(f"== group={group}: p_pad={p_pad} "
              f"({p_pad / ranks_np.size:.3f} of P)", flush=True)

        def g32(f):
            return f[od % npix]

        def g16(f):
            return f[od % npix].astype(jnp.float32)

        def gmul(f):
            return dp.reshape(-1)[od, None] * f[od % npix]

        def gmul_pre(f):
            v = dp.reshape(-1)[od, None] * f[od % npix]
            if group > 1:
                v = v.reshape(-1, group, C_tr).sum(axis=1)
            return v

        def red_seg(f):
            v = gmul_pre(f)
            return jax.ops.segment_sum(
                v, jnp.minimum(rk[::group], nvox), num_segments=nvox + 1,
                indices_are_sorted=True)[:nvox]

        def red_cum(f):
            v = gmul_pre(f)
            return segment_sum_bounds(v, rk[::group], bd, nvox)

        for name, fn, arg in [
            ("feat row-gather f32", g32, feat32),
            ("feat row-gather bf16+cast", g16, feat16),
            ("+ dp gather * mul", gmul, feat32),
            ("+ group pre-reduce", gmul_pre, feat32),
            ("full: seg reduction", red_seg, feat32),
            ("full: cumsum-bounds", red_cum, feat32),
        ]:
            # reduce output to a scalar-ish feedback leaf cheaply
            t = timeit(fn, arg)
            print(f"  {name:28s}: {t:7.2f} ms", flush=True)

        t = timeit(
            lambda d: lift_splat_static(
                d[None], feat32.reshape(1, fH, fW, C_tr), od[None],
                rk[None], grid, group=group, bounds=bd[None]),
            dp,
        )
        print(f"  lift_splat_static (cumsum)  : {t:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
