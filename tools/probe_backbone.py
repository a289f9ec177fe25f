#!/usr/bin/env python
"""On-chip ablation of the images stage (backbone + neck) at bench shapes.

BENCH_r04 stage split: images 21.0 ms for 222 GFLOP (both eyes) = ~10.6
TF/s — the lowest-utilization stage after round-4's view-stage work. This
probe attributes the cost: CustomEfficientNet stops tracing at
max(out_indices), so instantiating the backbone with out_indices=(k,)
times the prefix through stage k; successive differences give per-stage
marginals, then the full backbone and backbone+SECONDFPN compositions
bound the neck's in-graph cost.

Usage: python tools/probe_backbone.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.probe_view import dispatch_overhead, make_variables, timeit  # noqa: E402

from stereoscene_tpu.models.detector import DetectorConfig  # noqa: E402
from stereoscene_tpu.models.efficientnet import CustomEfficientNet  # noqa: E402
from stereoscene_tpu.models.second_fpn import SECONDFPN  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    cfg = DetectorConfig()
    imgs = jnp.asarray(rng.randn(2, *cfg.input_size, 3), jnp.bfloat16)

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)
    print(f"# input {imgs.shape} {imgs.dtype}, arch={cfg.backbone_arch}",
          flush=True)

    # NB: unlike the view-stage probes, the backbone's params are too large
    # to close over as jit constants (the inlined-constant MLIR exceeds the
    # relay's remote-compile request limit, HTTP 413) — pass them as args.
    prev = 0.0
    for k in range(1, 7):
        out_indices = (k,) if k <= 6 else cfg.backbone_out_indices
        m = CustomEfficientNet(arch=cfg.backbone_arch, out_indices=out_indices)
        v = make_variables(m, (imgs,))

        def run(x, v, m=m):
            outs = m.apply(v, x, train=False)
            return sum(o.astype(jnp.float32).mean() for o in outs)

        t = timeit(run, imgs, v)
        print(f"through stage {k}: {t:8.2f} ms  (marginal {t - prev:+6.2f})",
              flush=True)
        prev = t

    # full backbone (all tap indices) then + neck
    bb = CustomEfficientNet(arch=cfg.backbone_arch,
                            out_indices=cfg.backbone_out_indices)
    v_bb = make_variables(bb, (imgs,))

    def run_bb(x, v):
        outs = bb.apply(v, x, train=False)
        return sum(o.astype(jnp.float32).mean() for o in outs)

    t_bb = timeit(run_bb, imgs, v_bb)
    print(f"full backbone : {t_bb:8.2f} ms", flush=True)

    feats = jax.eval_shape(lambda x: bb.apply(v_bb, x, train=False), imgs)
    neck = SECONDFPN(
        in_channels=cfg.neck_in_channels,
        out_channels=cfg.neck_out_channels,
        upsample_strides=cfg.neck_upsample_strides,
    )
    feats_c = tuple(
        jnp.asarray(rng.randn(*f.shape), jnp.bfloat16) for f in feats
    )
    v_neck = make_variables(neck, (feats_c,))

    def run_neck(f0, rest, v):
        return neck.apply(v, (f0,) + rest, train=False).astype(
            jnp.float32).mean()

    t_neck = timeit(run_neck, feats_c[0], feats_c[1:], v_neck)
    print(f"neck standalone: {t_neck:8.2f} ms", flush=True)

    def run_full(x, v1, v2):
        outs = bb.apply(v1, x, train=False)
        y = neck.apply(v2, outs, train=False)
        return y.astype(jnp.float32).mean()

    t_full = timeit(run_full, imgs, v_bb, v_neck)
    print(f"backbone+neck : {t_full:8.2f} ms  (neck marginal "
          f"{t_full - t_bb:+6.2f})", flush=True)


if __name__ == "__main__":
    main()
