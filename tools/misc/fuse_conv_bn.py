#!/usr/bin/env python
"""Fold BatchNorms into convolutions in a saved checkpoint (the reference
tools/misc/fuse_conv_bn.py equivalent)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="orbax checkpoint dir")
    p.add_argument("config")
    p.add_argument("--out", required=True, help="output checkpoint dir")
    args = p.parse_args()

    import jax

    from stereoscene_tpu.config import Config
    from stereoscene_tpu.engine.checkpoint import CheckpointManager
    from stereoscene_tpu.engine.train import create_train_state
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
    from stereoscene_tpu.utils.fuse_bn import fuse_conv_bn
    from bench import make_flagship_batch

    cfg = Config.fromfile(args.config)
    det_cfg = DetectorConfig.from_config(cfg)
    model = BEVDepthOccupancy(cfg=det_cfg)
    batch = make_flagship_batch(det_cfg, 1)
    variables = jax.jit(lambda k: model.init(k, batch, train=False))(
        jax.random.PRNGKey(0)
    )
    state = create_train_state(model, variables)
    mgr = CheckpointManager(args.checkpoint)
    state, step = mgr.restore(state)

    params = jax.tree.map(lambda x: x, jax.device_get(state.params))
    stats = jax.device_get(state.batch_stats)
    fused_params, fused_stats, n = fuse_conv_bn(params, stats)
    print(f"fused {n} conv+bn pairs")

    out_mgr = CheckpointManager(args.out)
    out_mgr.save(
        step, state.replace(params=fused_params, batch_stats=fused_stats)
    )
    print(f"wrote fused checkpoint to {args.out}")


if __name__ == "__main__":
    main()
