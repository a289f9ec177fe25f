#!/usr/bin/env python
"""Dataset preparation dispatcher (the reference tools/create_data.py shape).

Supported:
  semantickitti — packed voxel label preprocessing (tools/preprocess_kitti.py)
  nuscenes      — expects mmdet3d-format info pickles; occupancy GT as
                  per-token .npy grids (see stereoscene_tpu/data/nuscenes.py).
                  Info-pickle generation needs the nuScenes devkit and is run
                  offline outside this environment.
  kitti         — detection info pickles + FOV-reduced clouds
                  (tools/data_converter/kitti_converter.py)
  lyft          — info pickles via the devkit adapter
                  (tools/data_converter/lyft_converter.py)
  waymo         — TFRecord -> KITTI-format conversion (needs tensorflow +
                  waymo_open_dataset; tools/data_converter/waymo_converter.py)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "dataset",
        choices=["semantickitti", "nuscenes", "kitti", "lyft", "waymo"],
    )
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scales", nargs="*", default=["1_1"])
    p.add_argument("--extra-tag", default=None)
    args = p.parse_args()

    if args.dataset == "semantickitti":
        from stereoscene_tpu.data.preprocess import process_sequences

        n = process_sequences(args.root, args.out, scales=args.scales)
        print(f"wrote {n} label files")
    elif args.dataset == "kitti":
        from tools.data_converter.kitti_converter import (
            create_kitti_info_file,
            create_reduced_point_cloud,
        )

        written = create_kitti_info_file(
            args.root, pkl_prefix=args.extra_tag or "kitti",
            save_path=args.out,
        )
        for split, path in written.items():
            print(f"kitti info {split}: {path}")
        for split in ("train", "val"):
            if split in written:
                n = create_reduced_point_cloud(args.root, written[split])
                print(f"reduced clouds ({split}): {n}")
    elif args.dataset == "lyft":
        raise SystemExit(
            "lyft: pass a devkit adapter to tools.data_converter."
            "lyft_converter.create_lyft_infos (the SDK is an offline-host "
            "dep; see that module's docstring)"
        )
    elif args.dataset == "waymo":
        from tools.data_converter.waymo_converter import Waymo2KITTI

        Waymo2KITTI(args.root, args.out).convert()
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
