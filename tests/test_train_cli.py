"""End-to-end CLI integration: tools/train.py + tools/test.py on the
synthetic mini-KITTI fixture with the tiny config (catches config plumbing,
loader, engine, and checkpoint bitrot in one shot)."""

import os
import subprocess
import sys

import numpy as np
import pytest

# full tier only: subprocess CLI end-to-end on a synthetic fixture
pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    from tests.test_data import CALIB_TXT
    from PIL import Image

    from stereoscene_tpu.data.preprocess import process_sequences

    root = tmp_path_factory.mktemp("cli_kitti")
    for seq, split_frames in (("00", ("000000", "000001")),
                              ("08", ("000000",))):
        seq_dir = root / "dataset" / "sequences" / seq
        for sub in ("image_2", "image_3", "voxels", "velodyne", "labels"):
            (seq_dir / sub).mkdir(parents=True, exist_ok=True)
        (seq_dir / "calib.txt").write_text(CALIB_TXT)
        rng = np.random.RandomState(0)
        for fid in split_frames:
            for cam in ("image_2", "image_3"):
                arr = rng.randint(0, 255, (376, 1241, 3), np.uint8)
                Image.fromarray(arr).save(seq_dir / cam / f"{fid}.png")
            n = 256 * 256 * 32
            labels = rng.choice(
                [0, 10, 40], size=n, p=[0.9, 0.05, 0.05]
            ).astype(np.uint16)
            labels.tofile(seq_dir / "voxels" / f"{fid}.label")
            np.packbits((rng.rand(n) < 0.1).astype(np.uint8)).tofile(
                seq_dir / "voxels" / f"{fid}.invalid"
            )
            (seq_dir / "voxels" / f"{fid}.bin").write_bytes(b"\0")
            pts = rng.uniform(-1, 1, (500, 4)).astype(np.float32)
            pts[:, 0] = rng.uniform(3, 15, 500)
            pts.tofile(seq_dir / "velodyne" / f"{fid}.bin")
            rng.choice([10, 40], size=500).astype(np.uint32).tofile(
                seq_dir / "labels" / f"{fid}.label"
            )
    out_root = root / "preproc"
    process_sequences(str(root), str(out_root), sequences=["00", "08"],
                      verbose=False)
    return root, out_root


def _write_config(tmp, root, out_root):
    cfg_path = tmp / "cfg.py"
    cfg_path.write_text(
        f"""_base_ = ['{REPO}/stereoscene_tpu/configs/stereoscene_tiny.py']
data_root = '{root}/'
ann_file = '{out_root}/labels/'
lidar_root = '{root}/dataset/sequences'
lidarseg_root = '{root}/dataset/sequences'
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=1,
    train=dict(data_root=data_root, ann_file=ann_file),
    val=dict(data_root=data_root, ann_file=ann_file),
    test=dict(data_root=data_root, ann_file=ann_file),
)
"""
    )
    return cfg_path


def test_train_and_test_cli(fixture_tree, tmp_path):
    root, out_root = fixture_tree
    cfg_path = _write_config(tmp_path, root, out_root)
    work_dir = tmp_path / "work"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         str(cfg_path), "--work-dir", str(work_dir), "--max-epochs", "1",
         "--batch-size", "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert (work_dir / "train_log.jsonl").exists()
    log = (work_dir / "train_log.jsonl").read_text()
    assert "loss_total" in log
    assert (work_dir / "ckpts").exists()

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         str(cfg_path), "--checkpoint", str(work_dir / "ckpts"),
         "--split", "val"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "semkitti_SC_IoU" in r.stdout
    assert "semkitti_combined_IoU" in r.stdout


def test_convert_eval_dress_rehearsal(fixture_tree, tmp_path):
    """First-contact path in ONE test (round-4 verdict item 7): a torch
    ``.pth`` checkpoint -> tools/convert_checkpoint.py -> orbax ->
    tools/test.py eval on the synthetic fixture, asserted against the torch
    oracle's OWN eval metrics over the identical loader stream. Covers the
    convert -> load -> eval -> metric chain exactly as a reference user
    would first exercise it (ref: tools/test.py + mmcv load_checkpoint)."""
    import re

    import jax
    import jax.numpy as jnp
    import torch
    import torch.nn.functional as F

    from stereoscene_tpu import metrics as ssc_metrics
    from stereoscene_tpu.config import Config
    from stereoscene_tpu.data import (
        BatchLoader, PipelineConfig, SemanticKittiIndex,
        SemanticKittiPipeline,
    )
    from stereoscene_tpu.engine.loop import KITTI_CLASS_NAMES
    from stereoscene_tpu.models.detector import DetectorConfig
    from tests.torch_oracle import TorchStereoScene, randomize_state

    root, out_root = fixture_tree
    cfg_path = _write_config(tmp_path, root, out_root)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    # ---- the "released checkpoint": a seeded torch oracle saved as .pth ----
    cfg = Config.fromfile(str(cfg_path))
    det_cfg = DetectorConfig.from_config(cfg)
    torch.manual_seed(0)
    oracle = TorchStereoScene(det_cfg).eval()
    randomize_state(oracle, seed=3)
    pth = tmp_path / "oracle.pth"
    torch.save({"state_dict": oracle.state_dict()}, pth)

    # ---- convert -> orbax via the CLI tool ----
    ckpt_dir = tmp_path / "converted"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
         str(pth), str(cfg_path), "--out", str(ckpt_dir)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    # ---- evaluate through tools/test.py ----
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         str(cfg_path), "--checkpoint", str(ckpt_dir), "--split", "val"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "restored checkpoint step" in r.stdout
    cli = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^\s+(semkitti_\S+): ([-\d.eE]+)",
                             r.stdout, re.M)
    }
    assert "semkitti_combined_IoU" in cli, r.stdout[-2000:]

    # ---- torch oracle's own eval over the identical loader stream ----
    data_cfg = cfg["data"]["val"]
    pipe_cfg = PipelineConfig(
        input_size=tuple(cfg["data_config"]["input_size"]),
        is_train=False,
        point_cloud_range=tuple(cfg["point_cloud_range"]),
    )
    index = SemanticKittiIndex(
        data_root=data_cfg["data_root"], ann_file=data_cfg["ann_file"],
        split="val",
    )
    loader = BatchLoader(
        index.shard(0, 1), SemanticKittiPipeline(pipe_cfg), batch_size=1,
        shuffle=False, drop_last=False, num_workers=0,
    )
    state = ssc_metrics.empty_state()
    with torch.no_grad():
        for batch in loader:
            tb = {k: torch.from_numpy(np.asarray(v).copy())
                  for k, v in batch.items()}
            logits = oracle(tb)["output_voxels"]  # [B, C, X, Y, Z]
            gt = tb["gt_occ"]
            if logits.shape[2:] != gt.shape[1:]:
                logits = F.interpolate(
                    logits, size=tuple(gt.shape[1:]), mode="trilinear",
                    align_corners=False,
                )
            pred = logits.argmax(dim=1).numpy()
            state = ssc_metrics.update_state(
                state, jnp.asarray(pred), jnp.asarray(gt.numpy())
            )
    ref = ssc_metrics.evaluate_dict(
        jax.device_get(state), KITTI_CLASS_NAMES
    )

    # identical weights modulo convert round-trip; forward parity ~1e-5, so
    # post-argmax confusion counts agree except knife-edge voxels — metrics
    # (percent scale) must match to well under a metric point. 0.02 covers
    # the CLI's 2-decimal print rounding plus a straddled rounding boundary
    # from single-voxel argmax flips (observed: road IoU 1.50 vs 1.51).
    for k, v in ref.items():
        if not np.isfinite(float(v)):
            continue  # class absent from the 1-frame fixture split
        assert k in cli, k
        np.testing.assert_allclose(cli[k], float(v), atol=0.02, err_msg=k)


def test_cfg_options_deep_override(tmp_path):
    """--cfg-options key.path=value semantics (ref tools/train.py:69-78 /
    mmcv Config.merge_from_dict)."""
    from stereoscene_tpu.config import Config, merge_from_options

    cfg = Config({
        "model": {"img_backbone": {"arch": "b7", "out_indices": (2, 3)}},
        "data": {"samples_per_gpu": 1},
        "grid_config": {"dbound": [2.0, 58.0, 0.5]},
    })
    merge_from_options(cfg, [
        "model.img_backbone.arch=b0",
        "data.samples_per_gpu=4",
        "model.img_backbone.with_cp=true",
        "grid_config.dbound.2=1.0",
        "optimizer.lr=1e-4",
        "model.img_backbone.out_indices=0,1,2",
    ])
    assert cfg["model"]["img_backbone"]["arch"] == "b0"
    assert cfg["data"]["samples_per_gpu"] == 4
    assert cfg["model"]["img_backbone"]["with_cp"] is True
    assert cfg["grid_config"]["dbound"] == [2.0, 58.0, 1.0]
    assert cfg["optimizer"]["lr"] == 1e-4
    assert cfg["model"]["img_backbone"]["out_indices"] == (0, 1, 2)


def test_cfg_options_cli_accepted(tiny_config_file=None):
    """Both CLIs expose --cfg-options."""
    import subprocess, sys

    for tool in ("tools/train.py", "tools/test.py"):
        out = subprocess.run(
            [sys.executable, tool, "--help"], capture_output=True, text=True,
            timeout=120,
        )
        assert "--cfg-options" in out.stdout, tool
