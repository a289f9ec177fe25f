"""Trainability of the optional supervision paths (VERDICT round-1 item 6):
CRP relation labels (GT producer + loss) and OccHead point-supervision
losses, each exercised end-to-end on the synthetic fixture."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from stereoscene_tpu.data.labels import (
    compute_cp_mega_matrix,
    downsample_label_monoscene,
)


def _reference_cp_matrix(target):
    """Direct transcription of the reference's triple loop
    (voxel_labels.py:128-176) as the oracle."""
    label = target.reshape(-1)
    n = label.shape[0]
    sv = [s // 2 for s in target.shape]
    matrix = np.zeros((4, n, sv[0] * sv[1] * sv[2]), np.uint8)
    for xx in range(sv[0]):
        for yy in range(sv[1]):
            for zz in range(sv[2]):
                col_idx = xx * (sv[1] * sv[2]) + yy * sv[2] + zz
                megas = np.array([
                    target[xx * 2, yy * 2, zz * 2],
                    target[xx * 2 + 1, yy * 2, zz * 2],
                    target[xx * 2, yy * 2 + 1, zz * 2],
                    target[xx * 2, yy * 2, zz * 2 + 1],
                    target[xx * 2 + 1, yy * 2 + 1, zz * 2],
                    target[xx * 2 + 1, yy * 2, zz * 2 + 1],
                    target[xx * 2, yy * 2 + 1, zz * 2 + 1],
                    target[xx * 2 + 1, yy * 2 + 1, zz * 2 + 1],
                ])
                megas = megas[megas != 255]
                for mega in megas:
                    col = np.ones(n) * mega
                    row = label
                    matrix[0, (row != 255) & (col == row) & (col != 0),
                           col_idx] = 1
                    matrix[1, (row != 255) & (col != row) & (col != 0)
                           & (row != 0), col_idx] = 1
                    matrix[2, (row != 255) & (row == col) & (col == 0),
                           col_idx] = 1
                    matrix[3, (row != 255) & (row != col)
                           & ((row == 0) | (col == 0)), col_idx] = 1
    return matrix


def test_cp_mega_matrix_matches_reference_loop():
    rng = np.random.RandomState(0)
    target = rng.choice(
        [0, 1, 2, 3, 255], size=(4, 4, 2), p=[0.4, 0.2, 0.2, 0.1, 0.1]
    ).astype(np.uint8)
    ours = compute_cp_mega_matrix(target)
    oracle = _reference_cp_matrix(target)
    np.testing.assert_array_equal(ours, oracle)


def test_downsample_label_monoscene_rules():
    label = np.zeros((4, 4, 4), np.uint8)
    # block 0: >95% empty (all zeros) -> 0
    # block at (1,0,0): mostly 255 -> 255
    label[2:4, 0:2, 0:2] = 255
    # block at (0,1,0): enough semantics -> majority semantic (ignores 0/255)
    label[0:2, 2:4, 0:2] = 0
    label[0, 2, 0] = 5
    label[0, 3, 0] = 5
    label[1, 2, 0] = 7
    out = downsample_label_monoscene(label, 2)
    assert out.shape == (2, 2, 2)
    assert out[0, 0, 0] == 0
    assert out[1, 0, 0] == 255
    assert out[0, 1, 0] == 5


def test_pipeline_emits_cp_mega_matrix(tmp_path):
    """The pipeline flag produces a correctly-shaped relation matrix from
    gt_occ."""
    from stereoscene_tpu.data.labels import compute_cp_mega_matrix as cm

    rng = np.random.RandomState(0)
    gt = rng.choice([0, 1, 2, 255], size=(8, 8, 4),
                    p=[0.5, 0.2, 0.2, 0.1]).astype(np.uint8)
    target = downsample_label_monoscene(gt, (2, 2, 2))
    mat = cm(target)
    assert mat.shape == (4, 4 * 4 * 2, 2 * 2 * 1)
    assert mat.max() <= 1


@pytest.mark.slow  # full tier: end-to-end training of an inactive family (its unit/shape tests stay in the fast tier); round-5 re-tiering, measured times in README
def test_crp_loss_trains_on_fixture():
    """loss_crp_weight > 0 runs end-to-end: detector with crp3d + the GT
    producer's matrix give a finite loss with nonzero gradients on the CRP
    parameters."""
    from tests.test_models import TINY, _tiny_batch
    from stereoscene_tpu.models.detector import BEVDepthOccupancy
    from stereoscene_tpu.engine.train import LossConfig, compute_losses

    cfg = dataclasses.replace(TINY, crp3d=True, crp_mega_shape=(2, 2, 1))
    model = BEVDepthOccupancy(cfg=cfg)
    batch = _tiny_batch()
    rng = np.random.RandomState(1)
    gt = rng.choice([0, 1, 2, 255], size=(8, 8, 4),
                    p=[0.5, 0.2, 0.2, 0.1]).astype(np.uint8)
    # crp stage-2 grid of the tiny config is (2, 2, 1) -> mega (1, 1, ...)
    # use the module's own logits shape to build matching GT
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    r, n_vox, n_mega = np.asarray(out["crp_logits"].shape)[1:]
    mat = (rng.rand(1, r, n_vox, n_mega) < 0.3).astype(np.float32)

    full_batch = dict(batch)
    full_batch["gt_occ"] = jnp.asarray(gt[None].astype(np.int32))
    full_batch["gt_depth"] = jnp.zeros(
        (1, 2) + tuple(cfg.input_size), jnp.float32
    )
    full_batch["cp_mega_matrix"] = jnp.asarray(mat)
    loss_cfg = LossConfig(loss_crp_weight=1.0, loss_depth_weight=0.0)

    def loss_fn(params):
        outputs = model.apply({"params": params["params"],
                               **{k: v for k, v in variables.items()
                                  if k != "params"}},
                              full_batch, train=False)
        losses = compute_losses(outputs, full_batch, loss_cfg)
        assert "loss_rel_ce" in losses
        return sum(losses.values())

    val, grads = jax.value_and_grad(loss_fn)({"params": variables["params"]})
    assert np.isfinite(float(val))
    crp_grads = jax.tree.leaves(
        grads["params"]["img_bev_encoder_backbone"]["cp_mega_voxels"]
    )
    assert crp_grads and any(
        float(jnp.abs(g).max()) > 0 for g in crp_grads
    )


@pytest.mark.slow  # full tier: end-to-end training of an inactive family (its unit/shape tests stay in the fast tier); round-5 re-tiering, measured times in README
def test_point_losses_train_on_fixture():
    """supervise_points=True: the point branch output is supervised by the
    new point CE/lovasz losses; gradients reach the point head."""
    from tests.test_models import TINY, _tiny_batch
    from stereoscene_tpu.models.detector import BEVDepthOccupancy
    from stereoscene_tpu.engine.train import LossConfig, compute_losses

    cfg = dataclasses.replace(TINY, supervise_points=True)
    model = BEVDepthOccupancy(cfg=cfg)
    batch = _tiny_batch()
    rng = np.random.RandomState(2)

    p = 32
    pts = np.zeros((1, p, 4), np.float32)
    pts[0, :, 0] = rng.uniform(0.5, 7.5, p)        # x in xbound
    pts[0, :, 1] = rng.uniform(-3.5, 3.5, p)       # y
    pts[0, :, 2] = rng.uniform(-1.5, 1.5, p)       # z
    pts[0, :, 3] = rng.randint(1, 20, p)           # labels (0 would be ignored)
    pts[0, 20:, 3] = 0                             # some ignore-label points
    uv = rng.uniform(-0.9, 0.9, (1, p, 3)).astype(np.float32)

    full_batch = dict(batch)
    full_batch["points_occ"] = jnp.asarray(pts)
    full_batch["points_uv"] = jnp.asarray(uv)
    full_batch["points_count"] = jnp.asarray([24], jnp.int32)
    full_batch["gt_occ"] = jnp.asarray(
        rng.randint(0, 3, (1, 8, 8, 4)).astype(np.int32))
    full_batch["gt_depth"] = jnp.zeros(
        (1, 2) + tuple(cfg.input_size), jnp.float32
    )

    variables = model.init(jax.random.PRNGKey(0), full_batch, train=False)
    out = model.apply(variables, full_batch, train=False)
    assert out["output_points"] is not None
    assert out["output_points"].shape == (1, p, 20)

    loss_cfg = LossConfig(
        loss_point_ce_weight=1.0, loss_point_lovasz_weight=1.0,
        loss_depth_weight=0.0,
    )

    aux_vars = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params):
        outputs = model.apply({"params": params, **aux_vars}, full_batch,
                              train=False)
        losses = compute_losses(outputs, full_batch, loss_cfg)
        assert "loss_point_ce" in losses and "loss_point_lovasz" in losses
        return sum(losses.values())

    val, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(val))
    head_grads = jax.tree.leaves(
        {k: v for k, v in grads["pts_bbox_head"].items() if "point" in k}
    )
    assert head_grads and any(
        float(jnp.abs(g).max()) > 0 for g in head_grads
    )
