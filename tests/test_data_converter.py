"""Tests for tools/data_converter: KITTI info generation over a synthetic
raw tree, box geometry, lyft info generation over synthetic tables, and the
waymo KITTI-format writer."""

import os
import pickle
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.data_converter import kitti_utils as ku
from tools.data_converter.kitti_converter import (
    create_kitti_info_file,
    create_reduced_point_cloud,
)
from tools.data_converter.lyft_converter import (
    create_lyft_infos,
    quaternion_to_matrix,
)
from tools.data_converter.waymo_converter import KittiFormatWriter


def _write_png(path, h, w):
    """Minimal valid grayscale PNG of size h x w."""
    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(png)


CALIB_TXT = """P0: 700 0 600 0 0 700 180 0 0 0 1 0
P1: 700 0 600 0 0 700 180 0 0 0 1 0
P2: 700 0 600 45 0 700 180 -0.1 0 0 1 0.003
P3: 700 0 600 -340 0 700 180 2 0 0 1 0.004
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 -0.08 1 0 0 -0.27
Tr_imu_to_velo: 1 0 0 0 0 1 0 0 0 0 1 -0.3
"""

LABEL_TXT = """Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59
Cyclist 0.00 3 -2.46 665.45 160.00 717.93 217.99 1.72 0.47 1.65 2.45 1.35 22.10 -2.35
DontCare -1 -1 -10 503.89 169.71 590.61 190.13 -1 -1 -1 -1000 -1000 -1000 -10
"""


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti"))
    for d in ("image_2", "label_2", "calib", "velodyne"):
        os.makedirs(os.path.join(root, "training", d))
    os.makedirs(os.path.join(root, "ImageSets"))
    rng = np.random.RandomState(0)
    for idx in range(3):
        s = f"{idx:06d}"
        _write_png(os.path.join(root, "training", "image_2", s + ".png"),
                   375, 1242)
        with open(os.path.join(root, "training", "calib", s + ".txt"),
                  "w") as f:
            f.write(CALIB_TXT)
        with open(os.path.join(root, "training", "label_2", s + ".txt"),
                  "w") as f:
            f.write(LABEL_TXT)
        # points: a cluster inside the Car box (lidar ~ (46.97, 0.65, ...))
        # plus background in front of the camera
        # Car cam loc (-0.65, 1.71, 46.70) -> lidar bottom (46.97, 0.65,
        # -1.79), gravity center z = -0.97
        cluster = np.array([46.97, 0.65, -0.97], np.float32) + \
            rng.randn(50, 3).astype(np.float32) * 0.2
        bg = np.stack([
            rng.uniform(5, 40, 200),
            rng.uniform(-5, 5, 200),
            rng.uniform(-1, 2, 200),
        ], axis=1).astype(np.float32)
        pts = np.concatenate([cluster, bg])
        pts4 = np.concatenate(
            [pts, np.ones((len(pts), 1), np.float32)], axis=1
        )
        pts4.tofile(
            os.path.join(root, "training", "velodyne", s + ".bin")
        )
    with open(os.path.join(root, "ImageSets", "train.txt"), "w") as f:
        f.write("0\n1\n")
    with open(os.path.join(root, "ImageSets", "val.txt"), "w") as f:
        f.write("2\n")
    return root


def test_parse_label_and_difficulty():
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(LABEL_TXT)
        path = f.name
    anno = ku.parse_label(path)
    assert list(anno["name"]) == ["Car", "Cyclist", "DontCare"]
    # hwl -> lhw
    np.testing.assert_allclose(anno["dimensions"][0], [3.64, 1.65, 1.67])
    assert list(anno["index"]) == [0, 1, -1]
    diff = ku.add_difficulty(anno)
    # Car: 2D height 26.8px (26.8 <= 40 so not easy; > 25, occ 0, trunc 0)
    # -> moderate; Cyclist: occlusion 3 fails every level -> -1
    assert diff[0] == 1
    assert diff[1] == -1
    os.unlink(path)


def test_parse_calib_shapes(kitti_tree):
    calib = ku.parse_calib(
        os.path.join(kitti_tree, "training", "calib", "000000.txt")
    )
    for k in ("P0", "P1", "P2", "P3", "R0_rect", "Tr_velo_to_cam"):
        assert calib[k].shape == (4, 4)
    assert calib["P2"][0, 0] == 700.0
    assert calib["R0_rect"][3, 3] == 1.0


def test_png_shape(kitti_tree):
    shape = ku.png_shape(
        os.path.join(kitti_tree, "training", "image_2", "000000.png")
    )
    np.testing.assert_array_equal(shape, [375, 1242])


def test_points_in_rbbox_rotation():
    # a 4x2x2 box at origin rotated 90deg: x extent becomes y extent
    box = np.array([[0, 0, 0, 4, 2, 2, np.pi / 2]])
    pts = np.array([[0, 1.9, 0], [1.9, 0, 0], [0.9, 0, 0]])
    inside = ku.points_in_rbbox(pts, box)[:, 0]
    assert bool(inside[0]) and not bool(inside[1]) and bool(inside[2])


def test_create_kitti_info_file(kitti_tree):
    written = create_kitti_info_file(kitti_tree, pkl_prefix="kitti")
    with open(written["train"], "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    info = infos[0]
    assert info["image"]["image_shape"].tolist() == [375, 1242]
    assert info["calib"]["P2"].shape == (4, 4)
    annos = info["annos"]
    # the synthetic cluster sits inside the Car box; DontCare gets -1
    assert annos["num_points_in_gt"][0] > 30
    assert annos["num_points_in_gt"][-1] == -1
    with open(written["trainval"], "rb") as f:
        assert len(pickle.load(f)) == 3


def test_create_reduced_point_cloud(kitti_tree):
    written = create_kitti_info_file(kitti_tree, pkl_prefix="kitti")
    n = create_reduced_point_cloud(kitti_tree, written["val"])
    assert n == 1
    reduced_dir = os.path.join(kitti_tree, "training", "velodyne_reduced")
    reduced = np.fromfile(
        os.path.join(reduced_dir, "000002.bin"), np.float32
    ).reshape(-1, 4)
    full = np.fromfile(
        os.path.join(kitti_tree, "training", "velodyne", "000002.bin"),
        np.float32,
    ).reshape(-1, 4)
    assert 0 < len(reduced) <= len(full)
    # every kept point projects inside the image with positive depth
    calib = ku.parse_calib(
        os.path.join(kitti_tree, "training", "calib", "000002.txt")
    )
    again = ku.remove_outside_points(
        reduced, calib["R0_rect"], calib["Tr_velo_to_cam"], calib["P2"],
        np.array([375, 1242]),
    )
    assert len(again) == len(reduced)


# ---------------------------------------------------------------------------
# lyft
# ---------------------------------------------------------------------------


class FakeTables:
    """Minimal nuScenes/Lyft-schema source: 2 samples, 1 camera, 1 sweep."""

    def __init__(self):
        ident = [1.0, 0, 0, 0]
        self.tables = {
            "calibrated_sensor": {
                "cs_lidar": {"rotation": ident, "translation": [0, 0, 1.8]},
                "cs_cam": {
                    "rotation": [0.5, -0.5, 0.5, -0.5],
                    "translation": [1.5, 0, 1.6],
                    "camera_intrinsic": [[500, 0, 400], [0, 500, 225],
                                         [0, 0, 1]],
                },
            },
            "ego_pose": {
                "p0": {"rotation": ident, "translation": [100, 50, 0]},
                "p1": {"rotation": ident, "translation": [110, 50, 0]},
            },
            "sample_data": {
                "sd_lidar0": {"calibrated_sensor_token": "cs_lidar",
                              "ego_pose_token": "p0", "timestamp": 0,
                              "prev": ""},
                "sd_lidar1": {"calibrated_sensor_token": "cs_lidar",
                              "ego_pose_token": "p1", "timestamp": 10,
                              "prev": "sd_lidar0"},
                "sd_cam0": {"calibrated_sensor_token": "cs_cam",
                            "ego_pose_token": "p0", "timestamp": 0,
                            "prev": ""},
                "sd_cam1": {"calibrated_sensor_token": "cs_cam",
                            "ego_pose_token": "p1", "timestamp": 10,
                            "prev": ""},
            },
            "sample_annotation": {
                "ann0": {"translation": [120, 50, 1], "size": [2, 5, 1.8],
                         "rotation": ident, "category_name": "car",
                         "num_lidar_pts": 7, "num_radar_pts": 0},
            },
        }
        self.sample = [
            {"token": "s0", "timestamp": 0, "scene_token": "scene_a",
             "data": {"LIDAR_TOP": "sd_lidar0", "CAM_FRONT": "sd_cam0"},
             "anns": ["ann0"]},
            {"token": "s1", "timestamp": 10, "scene_token": "scene_b",
             "data": {"LIDAR_TOP": "sd_lidar1", "CAM_FRONT": "sd_cam1"},
             "anns": []},
        ]

    def get(self, table, token):
        return self.tables[table][token]

    def get_sample_data_path(self, token):
        return f"/data/{token}.bin"


def test_quaternion_to_matrix():
    np.testing.assert_allclose(
        quaternion_to_matrix([1, 0, 0, 0]), np.eye(3), atol=1e-12
    )
    # 90deg about z
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    np.testing.assert_allclose(quaternion_to_matrix(q), expect, atol=1e-12)


def test_create_lyft_infos(tmp_path):
    src = FakeTables()
    written = create_lyft_infos(
        src, str(tmp_path), train_scene_tokens={"scene_a"}
    )
    with open(written["train"], "rb") as f:
        train = pickle.load(f)["infos"]
    with open(written["val"], "rb") as f:
        val = pickle.load(f)["infos"]
    assert len(train) == 1 and len(val) == 1
    info = train[0]
    assert info["token"] == "s0"
    assert "CAM_FRONT" in info["cams"]
    # ann at global [120, 50, 1] with lidar at [100, 50, 1.8] ->
    # lidar frame [20, 0, -0.8]
    np.testing.assert_allclose(
        info["gt_boxes"][0, :3], [20, 0, -0.8], atol=1e-9
    )
    assert info["gt_names"][0] == "car"
    # second sample has one sweep (prev chain)
    assert len(val[0]["sweeps"]) == 1
    # camera sensor2lidar: translation [1.5, 0, -0.2] (cam fwd of lidar)
    np.testing.assert_allclose(
        info["cams"]["CAM_FRONT"]["sensor2lidar_translation"],
        [1.5, 0, -0.2], atol=1e-9,
    )


# ---------------------------------------------------------------------------
# waymo writer
# ---------------------------------------------------------------------------


def test_waymo_kitti_writer(tmp_path):
    w = KittiFormatWriter(str(tmp_path), prefix=0, num_cams=5)
    assert w.index(1, 2) == "0001002"
    pts = np.random.RandomState(0).randn(10, 6).astype(np.float32)
    w.write_lidar(1, 2, pts)
    back = np.fromfile(
        os.path.join(str(tmp_path), "velodyne", "0001002.bin"), np.float32
    ).reshape(-1, 6)
    np.testing.assert_array_equal(back, pts)
    w.write_calib(
        1, 2, [np.eye(3, 4)] * 5, np.eye(3), [np.eye(4)] * 5
    )
    w.write_label(1, 2, None, [{
        "name": "Car", "bbox": [0, 0, 10, 10], "hwl": [1.5, 1.8, 4.0],
        "xyz": [1, 2, 30], "rotation_y": 0.5, "track_id": "abc",
    }])
    label = open(
        os.path.join(str(tmp_path), "label_all", "0001002.txt")
    ).read()
    assert label.startswith("Car ") and "abc" in label
    w.write_pose(1, 2, np.eye(4))
    assert os.path.exists(os.path.join(str(tmp_path), "pose", "0001002.txt"))


def test_waymo_converter_gated():
    from tools.data_converter.waymo_converter import Waymo2KITTI, _HAVE_WAYMO

    if not _HAVE_WAYMO:
        with pytest.raises(ImportError, match="waymo_open_dataset"):
            Waymo2KITTI("/tmp/in", "/tmp/out")


def test_create_groundtruth_database(kitti_tree):
    from tools.data_converter.create_gt_database import (
        create_groundtruth_database,
    )

    written = create_kitti_info_file(kitti_tree, pkl_prefix="kitti")
    db = create_groundtruth_database(
        kitti_tree, written["train"], info_prefix="kitti"
    )
    assert "Car" in db and len(db["Car"]) == 2  # one per train frame
    entry = db["Car"][0]
    assert entry["num_points_in_gt"] > 30
    pts = np.fromfile(
        os.path.join(kitti_tree, entry["path"]), np.float32
    ).reshape(-1, 4)
    assert len(pts) == entry["num_points_in_gt"]
    # points are in the box frame: centered near origin in x/y, z in [0, h]
    assert np.abs(pts[:, :2].mean(0)).max() < 1.0
    assert pts[:, 2].min() > -1.0 and pts[:, 2].max() < 3.0
    # db info pickle exists
    assert os.path.exists(
        os.path.join(kitti_tree, "kitti_dbinfos_train.pkl")
    )
    # box3d_lidar is the BOTTOM-center box (mmdet3d dbinfos convention):
    # cropped points shifted by it must sit in z within [0, dz]
    box = entry["box3d_lidar"]
    z_in_box = pts[:, 2]  # already bottom-center shifted
    assert z_in_box.min() > -0.5 and z_in_box.max() < box[5] + 0.5
    # pasting points at box3d_lidar's z reproduces the original cloud:
    # original z ~ box z + in-box z, so the original points' min z should
    # sit near box[2] (bottom), NOT near box[2] - dz/2
    orig = np.fromfile(
        os.path.join(kitti_tree, "training", "velodyne", "000000.bin"),
        np.float32,
    ).reshape(-1, 4)
    lo = (pts[:, 2] + box[2]).min()
    assert orig[:, 2].min() - 1.0 < lo < orig[:, 2].max() + 1.0


def test_waymo_box_to_kitti_row():
    """waymo volumetric-center front-left-up boxes -> KITTI bottom-center
    camera-frame rows (ref: waymo_converter.py:253-330)."""
    from tools.data_converter.waymo_converter import waymo_box_to_kitti_row

    # identity-rotation velo->cam with the KITTI axis swap:
    # cam x = -velo y, cam y = -velo z, cam z = velo x
    t = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]]
    )
    row = waymo_box_to_kitti_row(
        center=np.array([10.0, 2.0, 1.0]),
        lwh=np.array([4.0, 1.8, 1.5]),
        heading=0.25,
        obj_type=1,  # VEHICLE
        t_velo_to_cam=t,
        bbox2d=(1, 2, 3, 4),
        track_id="tid",
    )
    assert row["name"] == "Car"
    assert row["hwl"] == (1.5, 1.8, 4.0)
    # bottom center: z = 1.0 - 1.5/2 = 0.25 before the axis swap
    np.testing.assert_allclose(row["xyz"], (-2.0, -0.25, 10.0))
    assert row["rotation_y"] == pytest.approx(-0.25 - np.pi / 2)
    assert row["track_id"] == "tid"
    # SIGN / UNKNOWN filtered out
    assert waymo_box_to_kitti_row(
        np.zeros(3), np.ones(3), 0.0, 3, t
    ) is None


def test_kitti2waymo_inverts_waymo2kitti():
    """kitti_box_to_waymo (core/evaluation/kitti2waymo.py:106-160) must
    invert waymo_box_to_kitti_row (waymo_converter.py:253-330) up to the
    axis conventions."""
    from stereoscene_tpu.core.kitti2waymo import (
        KITTI_TO_WAYMO_TYPE, kitti_box_to_waymo,
        kitti_result_to_waymo_objects,
    )
    from tools.data_converter.waymo_converter import waymo_box_to_kitti_row

    rng = np.random.RandomState(9)
    t_velo_to_cam = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]]
    )
    t_k2w = np.linalg.inv(t_velo_to_cam)
    for _ in range(5):
        center = rng.rand(3) * 30
        lwh = rng.rand(3) * 3 + 0.5
        heading = float(rng.uniform(-np.pi, np.pi))
        row = waymo_box_to_kitti_row(
            center, lwh, heading, 1, t_velo_to_cam
        )
        h, w, l = row["hwl"]
        back = kitti_box_to_waymo(
            row["name"], np.array([l, h, w]), np.array(row["xyz"]),
            row["rotation_y"], 0.9, t_k2w,
        )
        np.testing.assert_allclose(
            [back["center_x"], back["center_y"], back["center_z"]],
            center, atol=2e-4,
        )
        np.testing.assert_allclose(
            [back["length"], back["width"], back["height"]], lwh, atol=1e-4
        )
        wrapped = (back["heading"] - heading + np.pi) % (2 * np.pi) - np.pi
        assert abs(wrapped) < 1e-3
        assert back["type"] == KITTI_TO_WAYMO_TYPE["Car"] == 1

    objs = kitti_result_to_waymo_objects(
        {
            "name": np.array(["Car", "Cyclist"]),
            "dimensions": rng.rand(2, 3) + 1,
            "location": rng.rand(2, 3) * 10,
            "rotation_y": rng.rand(2),
            "score": np.array([0.5, 0.25]),
            "sample_idx": np.array(["0001000", "0001000"]),
        },
        t_k2w, "ctx", 123456,
    )
    assert len(objs) == 2
    assert objs[0]["context_name"] == "ctx"
    assert objs[1]["frame_timestamp_micros"] == 123456
    assert objs[1]["type"] == 4  # TYPE_CYCLIST
