"""Evaluation: jitted inference + streaming SSC metric state.

Replaces ``custom_single_gpu_test``/``custom_multi_gpu_test``
(ref: occupancy/apis/test.py:66-273). The reference gathers per-rank metric
tuples through pickle files on a shared filesystem; here the metric state is
a tiny fixed-size pytree accumulated on device — multi-device reduction is a
single psum (or a host-side tree sum over per-shard states).

The prediction path matches ``simple_test``
(ref: bevdepth_occupancy.py:275-297): head logits are upsampled trilinearly
to the GT grid (align_corners=False), argmaxed, and fed to the metric update.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from .. import metrics as ssc_metrics
from ..ops.resize import resize_trilinear


def make_eval_step(model, gt_shape: Tuple[int, int, int] = (256, 256, 32)):
    """Returns eval_step(variables, batch, metric_state) -> (pred, state)."""

    def eval_step(variables, batch, metric_state):
        outputs = model.apply(variables, batch, train=False)
        logits = outputs["output_voxels"][0].astype(jnp.float32)
        # upsample to the ground truth's grid (ref bevdepth_occupancy.py:
        # 293-294 interpolates to gt_occ.shape); fall back to the configured
        # occ_size when no labels ship with the batch (submission mode)
        target = (
            batch["gt_occ"].shape[1:4] if "gt_occ" in batch else tuple(gt_shape)
        )
        if logits.shape[1:4] != tuple(target):
            logits = resize_trilinear(logits, target)
        pred = jnp.argmax(logits, axis=-1)
        if "gt_occ" in batch:
            metric_state = ssc_metrics.update_state(
                metric_state, pred, batch["gt_occ"]
            )
        return pred, metric_state

    return eval_step
