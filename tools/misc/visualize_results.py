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

from tools.visualize import add_render_args, render_frames


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
    add_render_args(p)
    p.set_defaults(out="vis_results", max_frames=100)
    args = p.parse_args()
    render_frames(load_results(args.results)[: args.max_frames], args)


if __name__ == "__main__":
    main()
