import os
import pickle

import numpy as np
import pytest

from stereoscene_tpu.data.nuscenes import (
    NUSC_CAMERAS,
    NuScenesIndex,
    NuScenesPipeline,
)
from stereoscene_tpu.data.pipeline import PipelineConfig


@pytest.fixture(scope="module")
def nusc_fixture(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("nusc")
    (root / "samples").mkdir()
    (root / "occ").mkdir()
    rng = np.random.RandomState(0)
    infos = []
    for i in range(2):
        cams = {}
        for cam in NUSC_CAMERAS:
            path = root / "samples" / f"{cam}_{i}.jpg"
            Image.fromarray(
                rng.randint(0, 255, (900, 1600, 3), np.uint8)
            ).save(path)
            cams[cam] = {
                "data_path": str(path),
                "cam_intrinsic": np.array(
                    [[1200.0, 0, 800], [0, 1200, 450], [0, 0, 1]]
                ),
                "sensor2lidar_rotation": np.eye(3),
                "sensor2lidar_translation": np.zeros(3),
            }
        token = f"tok{i}"
        np.save(root / "occ" / f"{token}.npy",
                rng.randint(0, 17, (200, 200, 16)).astype(np.uint8))
        infos.append({"token": token, "cams": cams})
    info_path = root / "infos.pkl"
    with open(info_path, "wb") as f:
        pickle.dump({"infos": infos}, f)
    return root, info_path


def test_nuscenes_index_and_pipeline(nusc_fixture):
    root, info_path = nusc_fixture
    idx = NuScenesIndex(str(info_path), occ_root=str(root / "occ"))
    assert len(idx) == 2
    pipe = NuScenesPipeline(
        PipelineConfig(input_size=(256, 704)), occ_root=str(root / "occ")
    )
    sample = pipe(idx[0])
    assert sample["imgs"].shape == (6, 256, 704, 3)
    assert sample["intrins"].shape == (6, 3, 3)
    assert sample["gt_occ"].shape == (200, 200, 16)
    # homography maps raw pixel to augmented pixel: check scale factor
    np.testing.assert_allclose(
        sample["post_rots"][0][0, 0], 704.0 / 1600.0, rtol=1e-5
    )
