#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) to an orbax checkpoint.

Covers the active BEVDepthOccupancy architecture: every parameter of the
mmcv-built module tree maps to our flax tree via the documented name map
(stereoscene_tpu/utils/convert_reference.py). Use --no-strict to convert a
partial checkpoint (e.g. a pretrained backbone with prefix 'backbone').
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt")
    p.add_argument("config")
    p.add_argument("--out", required=True, help="output orbax checkpoint dir")
    p.add_argument("--prefix", default="",
                   help="strip this prefix from torch keys (e.g. 'backbone.')")
    p.add_argument("--no-strict", action="store_true")
    args = p.parse_args()

    import numpy as np
    import torch
    import jax

    from stereoscene_tpu.config import Config
    from stereoscene_tpu.engine.checkpoint import CheckpointManager
    from stereoscene_tpu.engine.train import create_train_state
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
    from stereoscene_tpu.models.efficientnet import scaled_stage_settings
    from stereoscene_tpu.utils.convert_reference import (
        build_name_map,
        convert_reference_checkpoint,
    )
    from bench import make_flagship_batch

    raw = torch.load(args.torch_ckpt, map_location="cpu")
    sd = raw.get("state_dict", raw)
    sd = {
        (k[len(args.prefix):] if k.startswith(args.prefix) else k):
        v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in sd.items()
    }
    print(f"loaded {len(sd)} tensors")

    cfg = Config.fromfile(args.config)
    det_cfg = DetectorConfig.from_config(cfg)
    model = BEVDepthOccupancy(cfg=det_cfg)
    batch = make_flagship_batch(det_cfg, 1)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                          shapes["params"])
    stats = jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                         shapes.get("batch_stats", {}))

    _, stages, _ = scaled_stage_settings(det_cfg.backbone_arch)
    # blocks-per-level follows the configured ResNet3D depth (the same
    # {depth->blocks} map the model itself uses, models/detector.py)
    blocks = {10: 1, 18: 2}[det_cfg.resnet_depth]
    nm = build_name_map(
        backbone_stage_blocks=[len(s) for s in stages],
        resnet_blocks=(blocks,) * len(det_cfg.voxel_channels),
    )
    new_p, new_s = convert_reference_checkpoint(
        sd, nm, params, stats, strict=not args.no_strict
    )

    variables = {"params": new_p, "batch_stats": new_s}
    state = create_train_state(model, variables)
    mgr = CheckpointManager(args.out)
    mgr.save(0, state)
    print(f"wrote converted checkpoint to {args.out}")


if __name__ == "__main__":
    main()
