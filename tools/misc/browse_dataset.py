#!/usr/bin/env python
"""Browse pipeline outputs visually (the reference
tools/misc/browse_dataset.py): render each loaded frame's input image, the
LiDAR-projected depth overlay, and the voxel GT side-by-side as one PNG per
frame for quick dataset sanity checks.

Builds on the same pipeline objects as tools/debug_dataset.py (which prints
shapes/stats); this tool writes pictures.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stereoscene_tpu.config import Config
from stereoscene_tpu.data import (
    PipelineConfig,
    SemanticKittiIndex,
    SemanticKittiPipeline,
)
from stereoscene_tpu.data.pipeline import IMG_MEAN, IMG_STD
from tools.visualize import PALETTE


def _denorm(img: np.ndarray) -> np.ndarray:
    return np.clip(img * IMG_STD + IMG_MEAN, 0, 255).astype(np.uint8)


def render_frame(sample: dict, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 2, figsize=(14, 8), dpi=100)
    left = _denorm(np.asarray(sample["imgs"][0]))
    right = _denorm(np.asarray(sample["imgs"][1]))
    axes[0, 0].imshow(left)
    axes[0, 0].set_title("left")
    axes[0, 1].imshow(right)
    axes[0, 1].set_title("right")

    axes[1, 0].imshow(left)
    depth = np.asarray(sample.get("gt_depth", np.zeros(left.shape[:2])))
    if depth.ndim == 3:
        depth = depth[0]
    ys, xs = np.nonzero(depth > 0)
    axes[1, 0].scatter(xs, ys, c=depth[ys, xs], s=1, cmap="turbo")
    axes[1, 0].set_title("lidar depth overlay")

    gt = np.asarray(sample.get("gt_occ"))
    if gt is not None and gt.ndim == 3:
        # BEV top-down majority view of the semantic voxel GT
        occ = np.where((gt > 0) & (gt != 255), gt, 0)
        bev = occ.max(axis=2)
        axes[1, 1].imshow(
            PALETTE[bev % 20].transpose(1, 0, 2), origin="lower"
        )
        axes[1, 1].set_title("voxel GT (BEV max)")
    for ax in axes.flat:
        ax.set_axis_off()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--split", default="train")
    p.add_argument("--num-frames", type=int, default=5)
    p.add_argument("--out", default="browse")
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
    pipeline = SemanticKittiPipeline(
        PipelineConfig(
            input_size=tuple(cfg["data_config"]["input_size"]),
            is_train=False,
            load_lidar_depth=cfg.get("lidar_root") is not None,
            point_cloud_range=tuple(cfg["point_cloud_range"]),
        )
    )
    os.makedirs(args.out, exist_ok=True)
    for i in range(min(args.num_frames, len(index))):
        sample = pipeline(index[i])
        out_path = os.path.join(args.out, f"frame{i:04d}.png")
        render_frame(sample, out_path)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
