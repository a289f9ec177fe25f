"""Ground-truth object database for GT-sampling augmentation.

Capability rebuild of ``tools/data_converter/create_gt_database.py:109-338``
(mmdet3d's ``create_groundtruth_database``), operating directly on the info
pickles written by :mod:`kitti_converter` instead of an mmdet3d dataset +
pipeline stack: for every annotated box, the lidar points inside it are
cropped, shifted into the box frame (minus the box bottom-center, matching
mmdet3d's convention so sampled objects paste at any location), and written
to ``{prefix}_gt_database/{idx}_{name}_{i}.bin``; a
``{prefix}_dbinfos_train.pkl`` maps each class to its object entries
(path, box, num_points_in_gt, difficulty, group_id).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from .kitti_utils import box_camera_to_lidar, points_in_rbbox


def create_groundtruth_database(
    data_path: str,
    info_path: str,
    info_prefix: str = "kitti",
    used_classes: Optional[List[str]] = None,
    database_save_path: Optional[str] = None,
    db_info_save_path: Optional[str] = None,
    relative_path: bool = True,
    num_features: int = 4,
) -> Dict[str, list]:
    """Build the GT database from a KITTI-format info pickle.

    Returns the db_infos dict (also written to disk).
    """
    with open(info_path, "rb") as f:
        infos = pickle.load(f)

    database_save_path = database_save_path or os.path.join(
        data_path, f"{info_prefix}_gt_database"
    )
    db_info_save_path = db_info_save_path or os.path.join(
        data_path, f"{info_prefix}_dbinfos_train.pkl"
    )
    os.makedirs(database_save_path, exist_ok=True)

    db_infos: Dict[str, list] = {}
    for info in infos:
        idx = info["image"]["image_idx"]
        v_path = info["point_cloud"]["velodyne_path"]
        if relative_path:
            v_path = os.path.join(data_path, v_path)
        points = np.fromfile(v_path, np.float32).reshape(-1, num_features)
        annos = info["annos"]
        calib = info["calib"]
        num_obj = int(np.sum(annos["name"] != "DontCare"))
        if num_obj == 0:
            continue
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
        for i in range(num_obj):
            name = str(annos["name"][i])
            if used_classes is not None and name not in used_classes:
                continue
            gt_points = points[inside[:, i]].copy()
            # shift into the box frame: subtract the box bottom center
            # (mmdet3d convention — gravity center minus dz/2 in z)
            center = boxes_lidar[i, :3].copy()
            center[2] -= boxes_lidar[i, 5] / 2.0
            gt_points[:, :3] -= center
            filename = f"{idx}_{name}_{i}.bin"
            filepath = os.path.join(database_save_path, filename)
            gt_points.astype(np.float32).tofile(filepath)
            # box3d_lidar stores the BOTTOM-center box (mmdet3d dbinfos
            # convention; box_camera_to_lidar yields gravity centers), so
            # mmdet3d-style GT samplers paste objects at the right height
            box_bottom = boxes_lidar[i].copy()
            box_bottom[2] -= boxes_lidar[i, 5] / 2.0
            db_infos.setdefault(name, []).append({
                "name": name,
                "path": os.path.join(
                    os.path.basename(database_save_path), filename
                ),
                "image_idx": idx,
                "gt_idx": i,
                "box3d_lidar": box_bottom,
                "num_points_in_gt": int(inside[:, i].sum()),
                "difficulty": int(annos["difficulty"][i]),
                "group_id": int(annos["group_ids"][i]),
            })

    for name, lst in db_infos.items():
        print(f"gt database: {len(lst)} {name} objects")
    with open(db_info_save_path, "wb") as f:
        pickle.dump(db_infos, f)
    return db_infos
