#!/usr/bin/env python
"""Analytic per-stage FLOPs table for the flagship model.

Uses XLA cost analysis on the lowered (shape-only) stage graphs — no device
compute, runs anywhere. This is the replacement for the reference's fvcore
table (ref occupancy/apis/test.py:84) and the source of the
reference-throughput derivation in BASELINE.md (the reference's active graph
is architecturally identical, so its FLOP count is the same).

Usage: JAX_PLATFORMS=cpu python tools/flops_table.py [config]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import __graft_entry__ as graft
    from stereoscene_tpu.config import Config
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig

    cfg_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "stereoscene_tpu", "configs", "stereoscene_semantickitti.py",
    )
    det_cfg = DetectorConfig.from_config(Config.fromfile(cfg_path))
    # inference-mode model (no activation-checkpoint overhead in the count)
    det_cfg = DetectorConfig(**{
        **det_cfg.__dict__, "backbone_with_cp": False,
        "backbone_drop_path_rate": 0.0,
    })
    model = BEVDepthOccupancy(cfg=det_cfg)
    batch = graft._make_batch(det_cfg, b=1)

    var_shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(var_shapes["params"])
    )

    def flops_of(fn, *args):
        lowered = jax.jit(fn).lower(*args)
        try:
            cost = lowered.compile().cost_analysis()
        except Exception:
            cost = lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float((cost or {}).get("flops", float("nan")))

    fH = det_cfg.input_size[0] // det_cfg.downsample
    fW = det_cfg.input_size[1] // det_cfg.downsample
    C = sum(det_cfg.neck_out_channels)
    feat_sd = jax.ShapeDtypeStruct((1, fH, fW, C), jnp.float32)
    x, y, z = det_cfg.grid_shape
    vox_sd = jax.ShapeDtypeStruct((1, x, y, z, det_cfg.numC_Trans), jnp.float32)

    stages = {
        "image encoder (both eyes)": (
            lambda v, b: model.apply(v, b["imgs"], train=False,
                                     method=model.encode_images),
            (var_shapes, batch),
        ),
        "view transform (stereo+mono+MIE+splat)": (
            lambda v, fl, fr, b: model.apply(
                v, fl, fr, b, train=False, method=model.view_transform),
            (var_shapes, feat_sd, feat_sd, batch),
        ),
        "bev encoder + head": (
            lambda v, vx: model.apply(v, vx, train=False,
                                      method=model.bev_encode),
            (var_shapes, vox_sd),
        ),
    }

    print(f"config: {os.path.basename(cfg_path)}  "
          f"input {det_cfg.input_size}, D={det_cfg.num_depth}, "
          f"grid {det_cfg.grid_shape}, params {n_params/1e6:.1f}M")
    total = 0.0
    for name, (fn, args) in stages.items():
        f = flops_of(fn, *args)
        total += f
        print(f"  {name:45s} {f/1e9:10.1f} GFLOP")
    print(f"  {'TOTAL forward':45s} {total/1e9:10.1f} GFLOP")


if __name__ == "__main__":
    main()
