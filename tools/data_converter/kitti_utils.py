"""KITTI detection raw-data parsing + box geometry, numpy-only.

Capability rebuild of the reference's ``kitti_data_utils.py`` (path layout,
label/calib parsing, difficulty rule) and the ``box_np_ops`` pieces its info
generation needs (camera->lidar box transform, points-in-rotated-box test,
image-FOV point filtering) — re-implemented vectorized instead of the
reference's numba loops.

ref: tools/data_converter/kitti_data_utils.py:10-141 (paths, labels, calib),
     :467-509 (difficulty); kitti_converter.py:46-85 (num_points_in_gt).
"""

from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional

import numpy as np


# ---------------------------------------------------------------------------
# paths (ref: kitti_data_utils.py:10-90)
# ---------------------------------------------------------------------------


def image_index_str(idx: int) -> str:
    return f"{idx:06d}"


def _info_path(idx, prefix, folder, suffix, training, relative):
    split = "training" if training else "testing"
    rel = os.path.join(split, folder, image_index_str(idx) + suffix)
    return rel if relative else os.path.join(prefix, rel)


def image_path(idx, prefix, training=True, relative=True):
    return _info_path(idx, prefix, "image_2", ".png", training, relative)


def label_path(idx, prefix, training=True, relative=True):
    return _info_path(idx, prefix, "label_2", ".txt", training, relative)


def velodyne_path(idx, prefix, training=True, relative=True):
    return _info_path(idx, prefix, "velodyne", ".bin", training, relative)


def calib_path(idx, prefix, training=True, relative=True):
    return _info_path(idx, prefix, "calib", ".txt", training, relative)


def read_imageset(path: str) -> List[int]:
    with open(path) as f:
        return [int(line) for line in f.read().splitlines() if line.strip()]


def png_shape(path: str) -> np.ndarray:
    """(H, W) from the PNG IHDR header — no image library needed."""
    with open(path, "rb") as f:
        head = f.read(24)
    assert head[:8] == b"\x89PNG\r\n\x1a\n", f"not a PNG: {path}"
    w, h = struct.unpack(">II", head[16:24])
    return np.array([h, w], np.int32)


# ---------------------------------------------------------------------------
# label / calib parsing (ref: kitti_data_utils.py:92-141)
# ---------------------------------------------------------------------------


def parse_label(path: str) -> Dict[str, np.ndarray]:
    """KITTI label_2 txt -> annotation dict (dimensions converted from the
    file's hwl order to camera lhw, matching the reference)."""
    with open(path) as f:
        content = [line.strip().split(" ") for line in f if line.strip()]
    anno: Dict[str, np.ndarray] = {}
    anno["name"] = np.array([x[0] for x in content])
    num_gt = len(content)
    num_objects = sum(1 for x in content if x[0] != "DontCare")
    anno["truncated"] = np.array([float(x[1]) for x in content])
    anno["occluded"] = np.array([int(float(x[2])) for x in content])
    anno["alpha"] = np.array([float(x[3]) for x in content])
    anno["bbox"] = np.array(
        [[float(v) for v in x[4:8]] for x in content]
    ).reshape(-1, 4)
    anno["dimensions"] = np.array(
        [[float(v) for v in x[8:11]] for x in content]
    ).reshape(-1, 3)[:, [2, 0, 1]]  # hwl -> lhw
    anno["location"] = np.array(
        [[float(v) for v in x[11:14]] for x in content]
    ).reshape(-1, 3)
    anno["rotation_y"] = np.array([float(x[14]) for x in content]).reshape(-1)
    if content and len(content[0]) == 16:
        anno["score"] = np.array([float(x[15]) for x in content])
    else:
        anno["score"] = np.zeros((num_gt,))
    anno["index"] = np.array(
        list(range(num_objects)) + [-1] * (num_gt - num_objects), np.int32
    )
    anno["group_ids"] = np.arange(num_gt, dtype=np.int32)
    return anno


def _extend(mat: np.ndarray) -> np.ndarray:
    return np.concatenate([mat, np.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


def parse_calib(path: str, extend_matrix: bool = True) -> Dict[str, np.ndarray]:
    with open(path) as f:
        lines = f.readlines()

    def mat(line_idx, n, shape):
        vals = [float(v) for v in lines[line_idx].split(" ")[1:1 + n]]
        return np.array(vals).reshape(shape)

    out = {}
    for i, name in enumerate(["P0", "P1", "P2", "P3"]):
        p = mat(i, 12, (3, 4))
        out[name] = _extend(p) if extend_matrix else p
    r0 = mat(4, 9, (3, 3))
    if extend_matrix:
        r4 = np.zeros((4, 4), r0.dtype)
        r4[3, 3] = 1.0
        r4[:3, :3] = r0
        out["R0_rect"] = r4
    else:
        out["R0_rect"] = r0
    for i, name in zip((5, 6), ("Tr_velo_to_cam", "Tr_imu_to_velo")):
        t = mat(i, 12, (3, 4))
        out[name] = _extend(t) if extend_matrix else t
    return out


# ---------------------------------------------------------------------------
# difficulty (ref: kitti_data_utils.py:467-509)
# ---------------------------------------------------------------------------

_MIN_HEIGHT = (40.0, 25.0, 25.0)
_MAX_OCCLUSION = (0, 1, 2)
_MAX_TRUNC = (0.15, 0.3, 0.5)


def add_difficulty(anno: Dict[str, np.ndarray]) -> np.ndarray:
    height = anno["bbox"][:, 3] - anno["bbox"][:, 1]
    occ = anno["occluded"]
    trunc = anno["truncated"]

    def mask(level):
        return ~(
            (occ > _MAX_OCCLUSION[level])
            | (height <= _MIN_HEIGHT[level])
            | (trunc > _MAX_TRUNC[level])
        )

    easy, moderate, hard = mask(0), mask(1), mask(2)
    diff = np.full(len(height), -1, np.int32)
    diff[np.logical_xor(hard, moderate)] = 2
    diff[np.logical_xor(easy, moderate)] = 1
    diff[easy] = 0
    anno["difficulty"] = diff
    return diff


# ---------------------------------------------------------------------------
# box geometry (vectorized box_np_ops equivalents)
# ---------------------------------------------------------------------------


def camera_to_lidar_points(points: np.ndarray, rect: np.ndarray,
                           trv2c: np.ndarray) -> np.ndarray:
    """Rectified-camera xyz -> velodyne xyz ([N, 3], 4x4 calibs)."""
    homo = np.concatenate([points, np.ones((len(points), 1))], axis=1)
    return (homo @ np.linalg.inv(rect @ trv2c).T)[:, :3]


def box_camera_to_lidar(boxes: np.ndarray, rect: np.ndarray,
                        trv2c: np.ndarray) -> np.ndarray:
    """Camera boxes [N, 7] (bottom-center xyz, l h w, ry) -> lidar boxes
    [N, 7] (gravity-center xyz, dx dy dz along heading/left/up, yaw about
    +z). KITTI camera y points down and ry is about -y, so
    yaw = -ry - pi/2."""
    loc = camera_to_lidar_points(boxes[:, :3], rect, trv2c)
    l, h, w = boxes[:, 3], boxes[:, 4], boxes[:, 5]
    loc[:, 2] += h / 2.0  # bottom center -> gravity center
    yaw = -boxes[:, 6] - np.pi / 2.0
    return np.stack(
        [loc[:, 0], loc[:, 1], loc[:, 2], l, w, h, yaw], axis=1
    )


def points_in_rbbox(points: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """[N, 3] lidar points x [M, 7] lidar boxes -> [N, M] bool."""
    if len(boxes) == 0:
        return np.zeros((len(points), 0), bool)
    centers = boxes[:, :3]                       # [M, 3]
    dims = boxes[:, 3:6]                         # [M, 3]
    yaw = boxes[:, 6]
    rel = points[:, None, :] - centers[None]     # [N, M, 3]
    c, s = np.cos(-yaw), np.sin(-yaw)
    local_x = rel[..., 0] * c - rel[..., 1] * s
    local_y = rel[..., 0] * s + rel[..., 1] * c
    return (
        (np.abs(local_x) <= dims[None, :, 0] / 2.0)
        & (np.abs(local_y) <= dims[None, :, 1] / 2.0)
        & (np.abs(rel[..., 2]) <= dims[None, :, 2] / 2.0)
    )


def remove_outside_points(points: np.ndarray, rect: np.ndarray,
                          trv2c: np.ndarray, p2: np.ndarray,
                          image_shape: np.ndarray) -> np.ndarray:
    """Keep only velodyne points inside the camera-2 image frustum
    (ref: kitti_converter.py:62-64 remove_outside behavior)."""
    homo = np.concatenate(
        [points[:, :3], np.ones((len(points), 1))], axis=1
    )
    cam = homo @ (rect @ trv2c).T                # rectified camera frame
    depth = cam[:, 2]
    pix = cam @ p2.T
    u = pix[:, 0] / np.maximum(pix[:, 2], 1e-6)
    v = pix[:, 1] / np.maximum(pix[:, 2], 1e-6)
    h, w = int(image_shape[0]), int(image_shape[1])
    keep = (depth > 0) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    return points[keep]


# ---------------------------------------------------------------------------
# per-frame info assembly (ref: kitti_data_utils.py:141-263)
# ---------------------------------------------------------------------------


def build_image_info(
    idx: int,
    data_path: str,
    training: bool = True,
    label_info: bool = True,
    velodyne: bool = True,
    calib: bool = True,
    relative_path: bool = True,
    with_imageshape: bool = True,
) -> Dict:
    info: Dict = {
        "image": {
            "image_idx": idx,
            "image_path": image_path(idx, data_path, training, relative_path),
        },
        "point_cloud": {"num_features": 4},
    }
    if with_imageshape:
        abs_img = os.path.join(data_path, info["image"]["image_path"]) \
            if relative_path else info["image"]["image_path"]
        info["image"]["image_shape"] = png_shape(abs_img)
    if velodyne:
        info["point_cloud"]["velodyne_path"] = velodyne_path(
            idx, data_path, training, relative_path
        )
    if calib:
        info["calib"] = parse_calib(
            calib_path(idx, data_path, training, relative=False)
            if not relative_path
            else os.path.join(
                data_path, calib_path(idx, data_path, training, True)
            )
        )
    if label_info and training:
        lp = label_path(idx, data_path, training, relative_path)
        if relative_path:
            lp = os.path.join(data_path, lp)
        info["annos"] = parse_label(lp)
        add_difficulty(info["annos"])
    return info
