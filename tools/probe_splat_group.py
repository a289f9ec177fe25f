#!/usr/bin/env python
"""On-chip probe: group-aligned static splat vs the plain sorted segment-sum.

The in-graph lift/splat marginal is ~7 ms (tools/probe_lss_ablate.py). The
grouped plan pre-reduces G consecutive same-voxel rows densely (fuses with
the lift gather) and scatters G-x fewer rows — measuring whether the
segment-sum/scatter lowering is the cost or the gather/materialization is.

Usage: python tools/probe_splat_group.py
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
    B, fH, fW, D, C = 1, 48, 160, 112, 128
    grid = (128, 128, 16)
    nvox = int(np.prod(grid))
    p = D * fH * fW

    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.splat_plan import build_plan, compute_ranks_host
    from stereoscene_tpu.ops.voxel_pool import lift_splat_static

    # real bench-calib ranks (realistic voxel occupancy distribution)
    cfg = DetectorConfig()
    model = BEVDepthOccupancy(cfg=cfg)
    intrin = np.zeros((1, 2, 3, 4), np.float32)
    intrin[..., 0, 0] = 707.0
    intrin[..., 1, 1] = 707.0
    intrin[..., 0, 2] = 1280 / 2.0
    intrin[..., 1, 2] = 384 / 2.0
    intrin[..., 2, 2] = 1.0
    r = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    sample = {
        "rots": np.broadcast_to(r, (1, 2, 3, 3)).copy(),
        "trans": np.zeros((1, 2, 3), np.float32),
        "intrins": intrin,
        "post_rots": np.broadcast_to(np.eye(3, dtype=np.float32),
                                     (1, 2, 3, 3)).copy(),
        "post_trans": np.zeros((1, 2, 3), np.float32),
        "bda": np.broadcast_to(np.eye(3, dtype=np.float32),
                               (1, 3, 3)).copy(),
    }
    ranks = compute_ranks_host(model, sample)
    n_valid = int((ranks < nvox).sum())
    print(f"# in-bounds {n_valid}/{p} ({100 * n_valid / p:.1f}%)", flush=True)
    print(f"# dispatch overhead {dispatch_overhead():.2f} ms", flush=True)

    dp = jnp.asarray(rng.rand(B, D, fH, fW).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, fH, fW, C).astype(np.float32))

    ref = None
    for g in (1, 4, 8, 16, 32):
        order, rs = build_plan(np.asarray(ranks), nvox, group=g)
        print(f"# g={g}: P_pad={len(order)} "
              f"(+{100 * (len(order) / max(n_valid, 1) - 1):.1f}% pad)",
              flush=True)
        oj = jnp.asarray(order[None])
        rj = jnp.asarray(rs[None])

        out = jax.jit(
            lambda d, o=oj, r=rj, g=g: lift_splat_static(
                d, feat, o, r, grid, group=g)
        )(dp)
        if ref is None:
            ref = np.asarray(out)
        else:
            err = float(np.max(np.abs(np.asarray(out) - ref))
                        / (np.abs(ref).max() + 1e-9))
        t = timeit(
            lambda d, o=oj, r=rj, g=g: lift_splat_static(
                d, feat, o, r, grid, group=g),
            dp,
        )
        extra = "" if g == 1 else f", max rel err vs g=1 {err:.2e}"
        print(f"splat group={g:2d}: {t:6.2f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
