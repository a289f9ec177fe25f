"""Hermetic data-layer tests over a synthetic mini-KITTI tree
(SURVEY.md section 4 item d: tiny fixture with known calib)."""

import os

import numpy as np
import pytest

from stereoscene_tpu.data import (
    BatchLoader,
    PipelineConfig,
    SemanticKittiIndex,
    SemanticKittiPipeline,
    dynamic_baseline,
    inv_map,
    read_calib,
    remap_lut,
)
from stereoscene_tpu.data.preprocess import process_sequences

CALIB_TXT = """P0: 707.0 0.0 601.8 0.0 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P1: 707.0 0.0 601.8 -379.8 0.0 707.0 183.1 0.0 0.0 0.0 1.0 0.0
P2: 707.0 0.0 601.8 44.9 0.0 707.0 183.1 0.1 0.0 0.0 1.0 0.003
P3: 707.0 0.0 601.8 -339.5 0.0 707.0 183.1 2.2 0.0 0.0 1.0 0.003
Tr: 0.0004 -0.9999 -0.008 -0.012 -0.0072 0.0081 -0.9999 -0.054 0.9999 0.0005 -0.0072 -0.29
"""


@pytest.fixture(scope="module")
def kitti_tree(tmp_path_factory):
    """Two-frame synthetic sequence 00 placed in the train split."""
    from PIL import Image

    root = tmp_path_factory.mktemp("kitti")
    seq_dir = root / "dataset" / "sequences" / "00"
    for sub in ("image_2", "image_3", "voxels", "velodyne", "labels"):
        (seq_dir / sub).mkdir(parents=True, exist_ok=True)
    (seq_dir / "calib.txt").write_text(CALIB_TXT)

    rng = np.random.RandomState(0)
    for fid in ("000000", "000005"):
        for cam in ("image_2", "image_3"):
            arr = rng.randint(0, 255, (376, 1241, 3), np.uint8)
            Image.fromarray(arr).save(seq_dir / cam / f"{fid}.png")
        # packed voxel labels: 256*256*32 uint16 + bit-packed invalid
        n = 256 * 256 * 32
        labels = rng.choice(
            [0, 10, 40, 48, 70, 252], size=n, p=[0.8, 0.05, 0.05, 0.04, 0.04, 0.02]
        ).astype(np.uint16)
        labels.tofile(seq_dir / "voxels" / f"{fid}.label")
        invalid_bits = (rng.rand(n) < 0.1).astype(np.uint8)
        np.packbits(invalid_bits).tofile(seq_dir / "voxels" / f"{fid}.invalid")
        (seq_dir / "voxels" / f"{fid}.bin").write_bytes(b"\0")
        # lidar points + labels
        pts = rng.uniform(-1, 1, (1000, 4)).astype(np.float32)
        pts[:, 0] = rng.uniform(3, 40, 1000)  # forward
        pts[:, 1] = rng.uniform(-10, 10, 1000)
        pts[:, 2] = rng.uniform(-2, 1, 1000)
        pts.tofile(seq_dir / "velodyne" / f"{fid}.bin")
        seg = rng.choice([0, 10, 40, 48], size=1000).astype(np.uint32)
        seg.tofile(seq_dir / "labels" / f"{fid}.label")

    out_root = root / "preproc"
    n_written = process_sequences(
        str(root), str(out_root), sequences=["00"], verbose=False
    )
    assert n_written == 2
    return root, out_root


def test_remap_lut_semantics():
    lut = remap_lut()
    assert lut[0] == 0          # empty stays empty
    assert lut[1] == 255        # unlabeled -> invalid
    assert lut[10] == 1         # car
    assert lut[252] == 1        # moving-car folds into car
    assert lut[40] == 9         # road
    inv = inv_map()
    assert inv[1] == 10 and inv[9] == 40


def test_read_calib_and_baseline(kitti_tree):
    root, _ = kitti_tree
    calib = read_calib(str(root / "dataset/sequences/00/calib.txt"))
    assert calib["P2"].shape == (4, 4)
    b = dynamic_baseline(calib)
    np.testing.assert_allclose(b, (339.5 - (-44.9)) / 707.0, rtol=1e-5)


def test_index_and_pipeline(kitti_tree):
    root, out_root = kitti_tree
    idx = SemanticKittiIndex(
        data_root=str(root),
        ann_file=str(out_root / "labels"),
        split="train",
        lidar_root=str(root / "dataset" / "sequences"),
        lidarseg_root=str(root / "dataset" / "sequences"),
    )
    assert len(idx) == 2
    fr = idx[0]
    assert fr.voxel_path is not None and os.path.exists(fr.voxel_path)

    cfg = PipelineConfig(
        input_size=(192, 640), is_train=True, load_lidar_depth=True,
        max_points=2048,
    )
    sample = SemanticKittiPipeline(cfg)(fr)
    assert sample["imgs"].shape == (2, 192, 640, 3)
    assert sample["gt_occ"].shape == (256, 256, 32)
    assert sample["gt_depth"].shape == (2, 192, 640)
    assert sample["points_occ"].shape == (2048, 4)
    # depth map sparse but non-empty; depths positive where present
    d = sample["gt_depth"][0]
    assert (d > 0).sum() > 10
    assert d.max() < 100
    # labels contain only train ids + 255
    uniq = np.unique(sample["gt_occ"])
    assert set(uniq.tolist()) <= set(range(20)) | {255}


def test_lidar_projection_roundtrip(kitti_tree):
    """A point projected with the calib must land at the pixel that
    back-projects to it (consistency between pipeline and geometry)."""
    root, out_root = kitti_tree
    idx = SemanticKittiIndex(
        data_root=str(root), ann_file=str(out_root / "labels"), split="train"
    )
    fr = idx[0]
    from stereoscene_tpu.data.pipeline import project_lidar_to_image

    cam2lidar = np.linalg.inv(fr.T_velo_2_cam)
    pts = np.array([[10.0, 0.5, -0.5]], np.float32)
    uvd = project_lidar_to_image(
        pts, cam2lidar[:3, :3].astype(np.float32),
        cam2lidar[:3, 3].astype(np.float32), fr.P2.astype(np.float32),
        np.eye(3, dtype=np.float32), np.zeros(3, np.float32),
    )
    # forward project manually: x_cam = Tr @ x; pix = P2 @ [x_cam, 1]
    homo = np.concatenate([pts[0], [1.0]])
    cam = fr.T_velo_2_cam @ homo
    pix = fr.P2 @ np.concatenate([cam[:3], [1.0]])
    np.testing.assert_allclose(uvd[0, 2], pix[2], rtol=1e-4)
    np.testing.assert_allclose(uvd[0, 0], pix[0] / pix[2], rtol=1e-4)


def test_batch_loader(kitti_tree):
    root, out_root = kitti_tree
    idx = SemanticKittiIndex(
        data_root=str(root), ann_file=str(out_root / "labels"), split="train"
    )
    cfg = PipelineConfig(input_size=(96, 320))
    loader = BatchLoader(
        idx.frames, SemanticKittiPipeline(cfg), batch_size=2,
        shuffle=True, num_workers=2,
    )
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1
    assert batches[0]["imgs"].shape == (2, 2, 96, 320, 3)
    assert batches[0]["calib"].shape == (2,)


def test_create_voxel_labels_majority():
    from stereoscene_tpu.data.preprocess import create_voxel_labels

    pts = np.array(
        [[0.5, 0.5, 0.5], [0.6, 0.6, 0.4], [0.4, 0.5, 0.6], [3.5, 3.5, 1.5],
         [99.0, 0.0, 0.0]],
        np.float32,
    )
    labels = np.array([4, 4, 7, 2, 9], np.int32)
    out = create_voxel_labels(pts, labels, (4, 4, 2), [0, 0, 0, 4, 4, 2])
    assert out.shape == (4, 4, 2)
    assert out[0, 0, 0] == 4   # majority of (4, 4, 7)
    assert out[3, 3, 1] == 2
    assert out.sum() == 4 + 2  # everything else empty; OOB point dropped


def test_loader_aug_deterministic_across_worker_counts(kitti_tree):
    """Per-sample seeded augmentation draws are independent of worker-thread
    scheduling (VERDICT weak #8): the same loader seed yields bit-identical
    batches whether the pipeline runs on 1 thread or 4."""
    root, out_root = kitti_tree
    idx = SemanticKittiIndex(
        data_root=str(root), ann_file=str(out_root / "labels"), split="train"
    )
    cfg = PipelineConfig(
        input_size=(96, 320),
        resize=(-0.06, 0.11),
        rot=(-5.4, 5.4),
        flip=True,
        crop_h=(0.0, 0.0),
        is_train=True,
    )

    def collect(num_workers):
        loader = BatchLoader(
            idx.frames, SemanticKittiPipeline(cfg, seed=7), batch_size=1,
            shuffle=True, seed=7, num_workers=num_workers,
        )
        return [list(loader) for _ in range(2)]  # two epochs

    a, b = collect(1), collect(4)
    for ep_a, ep_b in zip(a, b):
        for batch_a, batch_b in zip(ep_a, ep_b):
            for k in batch_a:
                np.testing.assert_array_equal(batch_a[k], batch_b[k])
    # different epochs draw different augmentations
    assert not np.array_equal(a[0][0]["post_rots"], a[1][0]["post_rots"]) or \
        not np.array_equal(a[0][0]["imgs"], a[1][0]["imgs"])
