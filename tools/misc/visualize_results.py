#!/usr/bin/env python
"""Render saved evaluation results (the reference
tools/misc/visualize_results.py): loads prediction voxel grids written by
``tools/test.py --save-pred-dir`` (.npy per frame, or a results .pkl of
{frame_id: grid}), renders each with the full visualizer (palette, optional
camera frustum + FOV dimming), and optionally exports a GIF clip.
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from tools.visualize import (
    camera_frustum_mesh,
    compute_fov_mask,
    export_video,
    render_voxels,
)


def load_results(path: str):
    """-> list of (name, grid)."""
    if os.path.isdir(path):
        return [
            (os.path.splitext(os.path.basename(p))[0], np.load(p))
            for p in sorted(glob.glob(os.path.join(path, "*.npy")))
        ]
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            results = pickle.load(f)
        if isinstance(results, dict):
            return sorted(
                (str(k), np.asarray(v)) for k, v in results.items()
            )
        return [(f"{i:06d}", np.asarray(v)) for i, v in enumerate(results)]
    return [(os.path.splitext(os.path.basename(path))[0], np.load(path))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results", help="prediction dir, .npy, or results .pkl")
    p.add_argument("--out", default="vis_results")
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("--voxel-size", type=float, default=0.2)
    p.add_argument("--vox-origin", nargs=3, type=float,
                   default=[0.0, -25.6, -2.0])
    p.add_argument("--t-velo2cam", default=None)
    p.add_argument("--img-size", nargs=2, type=int, default=[1220, 370])
    p.add_argument("--focal", type=float, default=707.0912)
    p.add_argument("--video", default=None)
    args = p.parse_args()

    items = load_results(args.results)[: args.max_frames]
    os.makedirs(args.out, exist_ok=True)
    frustum = fov = None
    written = []
    for name, grid in items:
        if args.t_velo2cam and frustum is None:
            t = np.load(args.t_velo2cam)
            frustum = camera_frustum_mesh(
                t, tuple(args.img_size), args.focal,
                vox_origin=args.vox_origin,
            )
            fov = compute_fov_mask(
                grid.shape, args.voxel_size, args.vox_origin, t,
                tuple(args.img_size), args.focal,
            )
        out_path = os.path.join(args.out, name + ".png")
        render_voxels(
            grid, out_path, voxel_size=args.voxel_size,
            vox_origin=args.vox_origin, fov_mask=fov, frustum=frustum,
        )
        written.append(out_path)
        print("wrote", out_path)
    if args.video and written:
        export_video(written, args.video)
        print("wrote", args.video)


if __name__ == "__main__":
    main()
