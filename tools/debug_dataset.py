#!/usr/bin/env python
"""Dataset smoke test / debug dumps (the reference tools/debug_dataset.py):
iterates the pipeline, prints per-key shapes/ranges, and optionally saves
image + depth/seg overlays as PNGs for eyeballing."""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stereoscene_tpu.config import Config
from stereoscene_tpu.data import (
    PipelineConfig,
    SemanticKittiIndex,
    SemanticKittiPipeline,
)
from stereoscene_tpu.data.pipeline import IMG_MEAN, IMG_STD


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--num-frames", type=int, default=3)
    p.add_argument("--out", default=None, help="save overlay PNGs here")
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    data_cfg = cfg["data"][args.split if args.split != "test" else "test"]
    index = SemanticKittiIndex(
        data_root=data_cfg["data_root"],
        ann_file=data_cfg["ann_file"],
        split=args.split,
        lidar_root=cfg.get("lidar_root"),
        lidarseg_root=cfg.get("lidarseg_root"),
    )
    print(f"{len(index)} frames in split {args.split}")
    if len(index) == 0:
        return

    pipe = SemanticKittiPipeline(
        PipelineConfig(
            input_size=tuple(cfg["data_config"]["input_size"]),
            is_train=args.split == "train",
            load_lidar_depth=cfg.get("lidar_root") is not None,
            point_cloud_range=tuple(cfg["point_cloud_range"]),
        )
    )
    for i in range(min(args.num_frames, len(index))):
        sample = pipe(index[i])
        print(f"--- frame {index[i].sequence}/{index[i].frame_id}")
        for k, v in sample.items():
            v = np.asarray(v)
            print(
                f"  {k}: {v.shape} {v.dtype} "
                f"[{v.min():.3f}, {v.max():.3f}]"
                if v.size
                else f"  {k}: {v.shape}"
            )
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            from PIL import Image

            img = sample["imgs"][0] * IMG_STD + IMG_MEAN
            img = np.clip(img, 0, 255).astype(np.uint8)
            if "gt_depth" in sample:
                d = sample["gt_depth"][0]
                overlay = img.copy()
                mask = d > 0
                overlay[mask] = [255, 0, 0]
                img = np.concatenate([img, overlay], axis=0)
            Image.fromarray(img).save(
                os.path.join(args.out, f"{index[i].frame_id}.png")
            )
            print(f"  wrote {args.out}/{index[i].frame_id}.png")


if __name__ == "__main__":
    main()
