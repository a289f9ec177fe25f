"""Tests for auxiliary losses and augmentations."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stereoscene_tpu.losses import (
    frustum_proportion_loss,
    gaussian_depth_target,
    klv_depth_loss,
    local_geometric_anisotropy,
    position_aware_loss,
    soft_dice_loss,
)
from stereoscene_tpu.data.augment import bev_transform_matrix, grid_mask


def test_soft_dice_perfect_and_worst():
    t = np.zeros((1, 4, 4, 2), np.int64)
    t[0, :2] = 5
    probs_perfect = (t > 0).astype(np.float32)
    loss = float(soft_dice_loss(jnp.asarray(probs_perfect), jnp.asarray(t)))
    assert loss < 0.05
    probs_bad = 1.0 - probs_perfect
    loss_bad = float(soft_dice_loss(jnp.asarray(probs_bad), jnp.asarray(t)))
    assert loss_bad > 0.9


def test_lga_counts():
    t = np.zeros((1, 3, 3, 1), np.int64)
    t[0, 1, 1, 0] = 7  # single voxel differing from all 4 in-plane neighbors
    lga = np.asarray(local_geometric_anisotropy(jnp.asarray(t)))
    assert lga[0, 1, 1, 0] == 4  # 4 valid in-plane neighbors differ
    assert lga[0, 0, 0, 0] == 0 + 0 + 0  # corner matches its neighbors


def test_position_aware_loss_runs_and_upweights():
    rng = np.random.RandomState(0)
    logits = rng.randn(1, 6, 6, 2, 20).astype(np.float32)
    flat_t = np.zeros((1, 6, 6, 2), np.int64)
    loss_flat = float(
        position_aware_loss(jnp.asarray(logits), jnp.asarray(flat_t),
                            np.ones(20, np.float32))
    )
    assert np.isfinite(loss_flat)


def test_gaussian_depth_target_reference_semantics():
    """Reference-literal behavior (utils/gaussian.py:90-130, proven
    bit-exact in tests/test_reference_direct.py): the Normal's mean is
    min_depth/step evaluated on the raw-depth grid (unit mismatch kept for
    parity), masses are unnormalized CDF differences, and empty patches get
    depth value 0."""
    gt = np.zeros((1, 1, 16, 16), np.float32)
    gt[0, 0, 4, 4] = 3.0
    mass, vals = gaussian_depth_target(
        jnp.asarray(gt), 8, (2.0, 10.0, 0.5), 16
    )
    mass, vals = np.asarray(mass), np.asarray(vals)
    idx = int(vals.argmax())  # the one pixel with a return
    assert vals[idx] == 3.0
    # empty patches: depth 0 and (mu=0, sigma=1) mass left of the grid
    assert np.all(np.delete(vals, idx) == 0.0)
    # effective center = min_depth/step = 6.0 raw -> bin edges around 6.0
    edges = 1.75 + 0.5 * np.arange(17)
    peak = mass[idx].argmax()
    assert edges[peak] <= 6.0 <= edges[peak + 1]
    # interior center -> nearly all mass inside the grid, unnormalized
    assert 0.99 < mass[idx].sum() <= 1.0 + 1e-6


def test_klv_depth_loss_zero_for_matching_dist():
    gt = np.zeros((1, 1, 8, 8), np.float32)
    gt[0, 0, 2, 2] = 5.0
    mass, _ = gaussian_depth_target(jnp.asarray(gt), 8, (2.0, 10.0, 0.5), 16)
    probs = np.asarray(mass).reshape(1, 1, 1, 16)
    loss = float(
        klv_depth_loss(jnp.asarray(gt), jnp.asarray(probs), 8, (2.0, 10.0, 0.5))
    )
    assert loss < 1e-2


def test_frustum_proportion_loss_matches_torch():
    rng = np.random.RandomState(1)
    b, x, y, z, c, f = 1, 4, 4, 2, 5, 3
    logits = rng.randn(b, x, y, z, c).astype(np.float32)
    masks = rng.rand(b, f, x, y, z) < 0.4
    dists = rng.randint(0, 10, (b, f, c)).astype(np.float32)

    ours = float(
        frustum_proportion_loss(
            jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(dists)
        )
    )

    # torch transcription (semkitti.py:218-243)
    pred = F.softmax(torch.tensor(logits).permute(0, 4, 1, 2, 3), dim=1)
    t_masks = torch.tensor(masks)
    t_dists = torch.tensor(dists)
    batch_cnt = t_dists.sum(0)
    loss_sum, nonempty = 0.0, 0
    for fr in range(f):
        fm = t_masks[:, fr].unsqueeze(1).float()
        prob = (fm * pred).reshape(b, c, -1).permute(1, 0, 2).reshape(c, -1)
        cum_prob = prob.sum(dim=1)
        total_cnt = batch_cnt[fr].sum()
        total_prob = prob.sum()
        if total_prob > 0 and total_cnt > 0:
            tgt = batch_cnt[fr] / total_cnt
            cp = cum_prob / total_prob
            nz = tgt != 0
            kl = F.kl_div(torch.log(cp[nz]), tgt[nz], reduction="sum")
            loss_sum += float(kl)
            nonempty += 1
    ref = loss_sum / nonempty
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_grid_mask_shapes_and_prob():
    rng = jax.random.PRNGKey(0)
    imgs = jnp.ones((4, 64, 96, 3))
    out = grid_mask(imgs, rng, d_range=(8, 16), prob=1.0)
    frac = float(jnp.mean(out))
    # ratio 0.5 squares keep roughly 25% of pixels in mode 1
    assert 0.1 < frac < 0.5
    out_never = grid_mask(imgs, rng, prob=0.0)
    assert float(jnp.mean(out_never)) == 1.0


def test_bev_transform_matrix_identity():
    m = bev_transform_matrix(0.0, False, False, np.array([25.6, 0.0, 1.2]))
    np.testing.assert_allclose(m, np.eye(4), atol=1e-6)
    m_flip = bev_transform_matrix(0.0, True, False, np.zeros(3))
    np.testing.assert_allclose(m_flip[0, 0], -1.0)
