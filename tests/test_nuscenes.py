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


def test_attribute_error_aae():
    """AAE (ref nuscnes_eval.py:661 / devkit attr_acc): 1 - attribute
    accuracy over matched TPs, NaN-skipping empty-attribute GTs, and the
    NDS denominator grows to the full 10 with attributes on."""
    from stereoscene_tpu.core.nuscenes_eval import (
        DetBox, evaluate_detections, attr_acc,
    )

    def box(tok, x, name, score=-1.0, attr=""):
        return DetBox(
            sample_token=tok, translation=np.array([x, 0.0, 0.0]),
            size=np.array([2.0, 2.0, 2.0]), yaw=0.0,
            velocity=np.zeros(2), detection_name=name, score=score,
            attribute_name=attr,
        )

    # attr_acc semantics
    g = box("s", 0, "car", attr="vehicle.moving")
    p = box("s", 0, "car", 0.9, attr="vehicle.moving")
    assert attr_acc(g, p) == 1.0
    p2 = box("s", 0, "car", 0.9, attr="vehicle.parked")
    assert attr_acc(g, p2) == 0.0
    g_empty = box("s", 0, "car", attr="")
    assert np.isnan(attr_acc(g_empty, p))

    gts = [box("s1", 0, "car", attr="vehicle.moving"),
           box("s2", 10, "car", attr="vehicle.moving")]
    # perfect detections, one attribute wrong
    preds = [box("s1", 0.01, "car", 0.95, attr="vehicle.moving"),
             box("s2", 10.01, "car", 0.90, attr="vehicle.parked")]
    m = evaluate_detections(gts, preds, classes=("car",),
                            with_attributes=True)
    assert "attr_err" in m.tp_errors
    assert 0.0 < m.tp_errors["attr_err"] < 1.0
    # denominator: 5*mAP + 5 TP scores over 10
    expected = (5 * m.mean_ap + sum(
        1 - min(1, m.tp_errors[k]) for k in m.tp_errors
    )) / 10.0
    assert m.nd_score == pytest.approx(expected)

    # without attributes: old 4-metric behavior preserved
    m4 = evaluate_detections(gts, preds, classes=("car",))
    assert "attr_err" not in m4.tp_errors
