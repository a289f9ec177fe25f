#!/usr/bin/env python
"""Dataset preparation dispatcher (the reference tools/create_data.py shape).

Supported:
  semantickitti — packed voxel label preprocessing (tools/preprocess_kitti.py)
  nuscenes      — expects mmdet3d-format info pickles; occupancy GT as
                  per-token .npy grids (see stereoscene_tpu/data/nuscenes.py).
                  Info-pickle generation needs the nuScenes devkit and is run
                  offline outside this environment.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dataset", choices=["semantickitti", "nuscenes"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scales", nargs="*", default=["1_1"])
    args = p.parse_args()

    if args.dataset == "semantickitti":
        from stereoscene_tpu.data.preprocess import process_sequences

        n = process_sequences(args.root, args.out, scales=args.scales)
        print(f"wrote {n} label files")
    else:
        from stereoscene_tpu.data.nuscenes import NuScenesIndex

        info = os.path.join(args.root, "nuscenes_infos_train.pkl")
        if not os.path.exists(info):
            raise SystemExit(
                f"missing {info}; generate info pickles with the nuScenes "
                "devkit offline (mmdet3d create_data format)"
            )
        idx = NuScenesIndex(info)
        print(f"validated {len(idx)} samples in {info}")


if __name__ == "__main__":
    main()
