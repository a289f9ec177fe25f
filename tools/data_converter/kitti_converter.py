"""KITTI detection info-pickle generation + reduced point clouds.

Capability rebuild of ``tools/data_converter/kitti_converter.py:46-332``:
``create_kitti_info_file`` scans the KITTI detection layout
(ImageSets/{train,val,test}.txt + training/{image_2,label_2,calib,velodyne})
into mmdet3d-format info pickles (train/val/trainval/test), annotates
``num_points_in_gt`` per box, and ``create_reduced_point_cloud`` writes
velodyne_reduced/ clouds filtered to the camera-2 frustum.
"""

from __future__ import annotations

import os
import pickle
from concurrent import futures
from typing import List, Optional

import numpy as np

from .kitti_utils import (
    box_camera_to_lidar,
    build_image_info,
    points_in_rbbox,
    read_imageset,
    remove_outside_points,
)


def _load_points(path: str, num_features: int = 4) -> np.ndarray:
    return np.fromfile(path, dtype=np.float32).reshape(-1, num_features)


def calculate_num_points_in_gt(
    data_path: str,
    infos: List[dict],
    relative_path: bool = True,
    remove_outside: bool = True,
    num_features: int = 4,
) -> None:
    """Annotate each info's annos with per-box lidar point counts
    (ref: kitti_converter.py:46-85; DontCare boxes get -1)."""
    for info in infos:
        v_path = info["point_cloud"]["velodyne_path"]
        if relative_path:
            v_path = os.path.join(data_path, v_path)
        points = _load_points(v_path, num_features)
        calib = info["calib"]
        if remove_outside:
            points = remove_outside_points(
                points, calib["R0_rect"], calib["Tr_velo_to_cam"],
                calib["P2"], info["image"]["image_shape"],
            )
        annos = info["annos"]
        num_obj = int(np.sum(annos["name"] != "DontCare"))
        boxes_cam = np.concatenate(
            [
                annos["location"][:num_obj],
                annos["dimensions"][:num_obj],
                annos["rotation_y"][:num_obj, None],
            ],
            axis=1,
        )
        boxes_lidar = box_camera_to_lidar(
            boxes_cam, calib["R0_rect"], calib["Tr_velo_to_cam"]
        )
        inside = points_in_rbbox(points[:, :3], boxes_lidar)
        counts = inside.sum(0)
        num_ignored = len(annos["name"]) - num_obj
        annos["num_points_in_gt"] = np.concatenate(
            [counts, -np.ones(num_ignored)]
        ).astype(np.int32)


def create_kitti_info_file(
    data_path: str,
    pkl_prefix: str = "kitti",
    save_path: Optional[str] = None,
    relative_path: bool = True,
    num_workers: int = 8,
) -> dict:
    """ref: kitti_converter.py:87-149. Returns {split: path} of written
    pickles."""
    imageset = os.path.join(data_path, "ImageSets")
    train_ids = read_imageset(os.path.join(imageset, "train.txt"))
    val_ids = read_imageset(os.path.join(imageset, "val.txt"))
    test_path = os.path.join(imageset, "test.txt")
    test_ids = read_imageset(test_path) if os.path.exists(test_path) else []
    save_path = save_path or data_path
    os.makedirs(save_path, exist_ok=True)

    def build(ids, training, label_info):
        with futures.ThreadPoolExecutor(num_workers) as ex:
            return list(
                ex.map(
                    lambda i: build_image_info(
                        i, data_path, training=training,
                        label_info=label_info,
                        relative_path=relative_path,
                    ),
                    ids,
                )
            )

    written = {}
    infos_train = build(train_ids, True, True)
    calculate_num_points_in_gt(data_path, infos_train, relative_path)
    infos_val = build(val_ids, True, True)
    calculate_num_points_in_gt(data_path, infos_val, relative_path)

    for split, infos in (
        ("train", infos_train),
        ("val", infos_val),
        ("trainval", infos_train + infos_val),
    ):
        path = os.path.join(save_path, f"{pkl_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump(infos, f)
        written[split] = path

    if test_ids:
        infos_test = build(test_ids, False, False)
        path = os.path.join(save_path, f"{pkl_prefix}_infos_test.pkl")
        with open(path, "wb") as f:
            pickle.dump(infos_test, f)
        written["test"] = path
    return written


def create_reduced_point_cloud(
    data_path: str,
    info_path: str,
    save_dir: Optional[str] = None,
    num_features: int = 4,
) -> int:
    """Write FOV-filtered clouds to velodyne_reduced/
    (ref: kitti_converter.py:232-332). Returns the number written."""
    with open(info_path, "rb") as f:
        infos = pickle.load(f)
    n = 0
    for info in infos:
        v_path = os.path.join(data_path, info["point_cloud"]["velodyne_path"])
        points = _load_points(v_path, num_features)
        calib = info["calib"]
        reduced = remove_outside_points(
            points, calib["R0_rect"], calib["Tr_velo_to_cam"], calib["P2"],
            info["image"]["image_shape"],
        )
        out_dir = save_dir or os.path.join(
            os.path.dirname(os.path.dirname(v_path)), "velodyne_reduced"
        )
        os.makedirs(out_dir, exist_ok=True)
        reduced.astype(np.float32).tofile(
            os.path.join(out_dir, os.path.basename(v_path))
        )
        n += 1
    return n
