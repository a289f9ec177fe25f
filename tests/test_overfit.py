"""Training-convergence smoke: the full detector + train step must overfit a
single synthetic sample (loss strictly decreasing) — end-to-end gradient
sanity through every module."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.engine.train import (
    LossConfig,
    create_train_state,
    make_train_step,
)
from stereoscene_tpu.models.detector import BEVDepthOccupancy

import pytest

# full tier only: end-to-end training overfit
pytestmark = pytest.mark.slow


def test_overfit_single_batch():
    import __graft_entry__ as graft

    cfg = graft._tiny_cfg()
    model = BEVDepthOccupancy(cfg=cfg)
    batch = graft._make_batch(cfg, b=1)
    # make the target learnable: a simple structured label grid
    x, y, z = cfg.grid_shape
    gt = np.zeros((1, 2 * x, 2 * y, 2 * z), np.int32)
    gt[:, : x, :, :] = 9  # "road" half
    batch["gt_occ"] = jnp.asarray(gt)

    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = create_train_state(model, variables, lr=3e-4, steps_per_epoch=100)
    loss_cfg = LossConfig(downsample=cfg.downsample, dbound=cfg.dbound)
    step = jax.jit(make_train_step(model, loss_cfg))

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, logs = step(state, batch, sub)
        losses.append(float(logs["loss_total"]))

    assert np.isfinite(losses).all()
    # substantial decrease over the run and final < first
    assert losses[-1] < losses[0] * 0.8, losses
