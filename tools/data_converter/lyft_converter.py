"""Lyft (and nuScenes-schema) info-pickle generation, devkit-free.

Capability rebuild of ``tools/data_converter/lyft_converter.py:18-214``: the
same train/val info records (lidar path, per-camera sensor2lidar transforms,
lidar sweeps, SECOND-convention gt boxes), generated over a minimal table
interface instead of the Lyft SDK — any object with the nuScenes-style
``sample`` / ``sample_data`` / ``calibrated_sensor`` / ``ego_pose`` tables
satisfies it (the devkits do, via a five-line adapter; synthetic tables do
for tests, which is how this module is exercised in an environment without
the SDK or raw data).

Coordinate math: all sensor->lidar-top transforms are composed as 4x4
homogeneous matrices (sensor2lidar = inv(ego2global_key @ lidar2ego_key) @
ego2global_s @ sensor2ego_s) — algebraically identical to the reference's
transposed-rotation chain (ref lyft_converter.py:143-166 via
nuscenes_converter.obtain_sensor2top).
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Protocol, Tuple

import numpy as np


def quaternion_to_matrix(q) -> np.ndarray:
    """[w, x, y, z] -> 3x3 rotation matrix."""
    w, x, y, z = [float(v) for v in q]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_to_mat(rotation, translation) -> np.ndarray:
    t = np.eye(4)
    t[:3, :3] = quaternion_to_matrix(rotation)
    t[:3, 3] = np.asarray(translation, float)
    return t


class TableSource(Protocol):
    """The slice of the nuScenes/Lyft devkit API this converter needs."""

    sample: List[dict]

    def get(self, table: str, token: str) -> dict: ...

    def get_sample_data_path(self, token: str) -> str: ...


CAMERA_TYPES = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def obtain_sensor2top(src: TableSource, sensor_token: str,
                      lidar2global: np.ndarray, sensor_type: str) -> dict:
    """Sensor record with its transform into the key-frame lidar frame."""
    sd = src.get("sample_data", sensor_token)
    cs = src.get("calibrated_sensor", sd["calibrated_sensor_token"])
    pose = src.get("ego_pose", sd["ego_pose_token"])
    sensor2global = _pose_to_mat(pose["rotation"], pose["translation"]) @ \
        _pose_to_mat(cs["rotation"], cs["translation"])
    sensor2lidar = np.linalg.inv(lidar2global) @ sensor2global
    return {
        "data_path": src.get_sample_data_path(sensor_token),
        "type": sensor_type,
        "sample_data_token": sensor_token,
        "sensor2ego_translation": cs["translation"],
        "sensor2ego_rotation": cs["rotation"],
        "ego2global_translation": pose["translation"],
        "ego2global_rotation": pose["rotation"],
        "timestamp": sd["timestamp"],
        "sensor2lidar_rotation": sensor2lidar[:3, :3],
        "sensor2lidar_translation": sensor2lidar[:3, 3],
    }


def fill_trainval_infos(
    src: TableSource,
    train_scenes: set,
    test: bool = False,
    max_sweeps: int = 10,
) -> Tuple[List[dict], List[dict]]:
    """ref: lyft_converter.py:93-213."""
    train_infos: List[dict] = []
    val_infos: List[dict] = []
    for sample in src.sample:
        lidar_token = sample["data"]["LIDAR_TOP"]
        sd = src.get("sample_data", lidar_token)
        cs = src.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pose = src.get("ego_pose", sd["ego_pose_token"])
        lidar2global = _pose_to_mat(pose["rotation"], pose["translation"]) @ \
            _pose_to_mat(cs["rotation"], cs["translation"])

        info = {
            "lidar_path": src.get_sample_data_path(lidar_token),
            "token": sample["token"],
            "sweeps": [],
            "cams": {},
            "lidar2ego_translation": cs["translation"],
            "lidar2ego_rotation": cs["rotation"],
            "ego2global_translation": pose["translation"],
            "ego2global_rotation": pose["rotation"],
            "timestamp": sample["timestamp"],
        }
        for cam in CAMERA_TYPES:
            if cam not in sample["data"]:
                continue
            cam_token = sample["data"][cam]
            cam_info = obtain_sensor2top(src, cam_token, lidar2global, cam)
            cam_cs = src.get(
                "calibrated_sensor",
                src.get("sample_data", cam_token)["calibrated_sensor_token"],
            )
            cam_info["cam_intrinsic"] = np.asarray(
                cam_cs["camera_intrinsic"], float
            )
            info["cams"][cam] = cam_info

        # lidar sweep chain (ref :168-180)
        rec = sd
        while len(info["sweeps"]) < max_sweeps and rec["prev"]:
            info["sweeps"].append(
                obtain_sensor2top(src, rec["prev"], lidar2global, "lidar")
            )
            rec = src.get("sample_data", rec["prev"])

        if not test:
            anns = [src.get("sample_annotation", t) for t in sample["anns"]]
            locs = np.array(
                [a["translation"] for a in anns], float
            ).reshape(-1, 3)
            dims = np.array([a["size"] for a in anns], float).reshape(-1, 3)
            # global -> lidar frame; yaw must come from the FULL rotation
            # composition R_lidar2global^T @ R_box (subtracting planar yaws
            # is only correct for pure-z ego rotations — pitch/roll on
            # sloped roads would corrupt it)
            r_g2l = np.linalg.inv(lidar2global)[:3, :3]
            yaws = np.array(
                [_mat_yaw(r_g2l @ quaternion_to_matrix(a["rotation"]))
                 for a in anns], float
            ).reshape(-1, 1)
            if len(locs):
                homo = np.concatenate(
                    [locs, np.ones((len(locs), 1))], axis=1
                )
                locs = (homo @ np.linalg.inv(lidar2global).T)[:, :3]
            # SECOND yaw convention (ref :196 ``-rots - pi/2``)
            gt_boxes = np.concatenate(
                [locs, dims, -yaws - np.pi / 2.0], axis=1
            )
            info["gt_boxes"] = gt_boxes
            info["gt_names"] = np.array([a["category_name"] for a in anns])
            info["num_lidar_pts"] = np.array(
                [a.get("num_lidar_pts", -1) for a in anns]
            )
            info["num_radar_pts"] = np.array(
                [a.get("num_radar_pts", -1) for a in anns]
            )

        if sample["scene_token"] in train_scenes:
            train_infos.append(info)
        else:
            val_infos.append(info)
    return train_infos, val_infos


def _mat_yaw(m: np.ndarray) -> float:
    return float(np.arctan2(m[1, 0], m[0, 0]))


def create_lyft_infos(
    src: TableSource,
    root_path: str,
    info_prefix: str = "lyft",
    train_scene_tokens: Optional[set] = None,
    max_sweeps: int = 10,
    test: bool = False,
) -> Dict[str, str]:
    """ref: lyft_converter.py:18-90. Returns {split: written path}."""
    train_scenes = train_scene_tokens or set()
    train, val = fill_trainval_infos(
        src, train_scenes, test=test, max_sweeps=max_sweeps
    )
    os.makedirs(root_path, exist_ok=True)
    written = {}
    if test:
        path = os.path.join(root_path, f"{info_prefix}_infos_test.pkl")
        with open(path, "wb") as f:
            pickle.dump({"infos": train + val, "metadata": {}}, f)
        written["test"] = path
        return written
    for split, infos in (("train", train), ("val", val)):
        path = os.path.join(root_path, f"{info_prefix}_infos_{split}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"infos": infos, "metadata": {}}, f)
        written[split] = path
    return written
