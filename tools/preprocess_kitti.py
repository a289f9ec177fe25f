#!/usr/bin/env python
"""Offline SemanticKITTI voxel-label preprocessing CLI.

Equivalent of the reference ``process_kitti.sh`` ->
``semantic_kitti_preprocess.py``: unpack packed voxel labels + invalid
masks, remap raw ids to the 20 train classes, write <frame>_1_1.npy files
(optionally majority-pooled multiscale variants).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from stereoscene_tpu.data.preprocess import ALL_SEQUENCES, process_sequences


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kitti-root", required=True,
                   help="dir containing dataset/sequences/<seq>/voxels")
    p.add_argument("--out-root", required=True)
    p.add_argument("--sequences", nargs="*", default=None)
    p.add_argument("--scales", nargs="*", default=["1_1"],
                   help="e.g. 1_1 1_2 1_4 (majority-pooled downscales)")
    args = p.parse_args()

    n = process_sequences(
        args.kitti_root,
        args.out_root,
        sequences=args.sequences or ALL_SEQUENCES,
        scales=args.scales,
    )
    print(f"wrote {n} label files to {args.out_root}")


if __name__ == "__main__":
    main()
