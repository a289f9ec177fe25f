"""SSC (semantic scene completion) metrics as a psum-reducible pytree.

Functional rebuild of the reference ``SSCMetrics`` torchmetrics class
(ref: projects/mmdet3d_plugin/utils/ssc_metric.py:14-169). The reference
accumulates per-class tp/fp/fn with Python loops over batch and class; here a
single flattened ``bincount`` over ``target * C + pred`` produces the full
confusion matrix, and the state is a small fixed-size pytree that can be
reduced across devices with ``jax.lax.psum`` (replacing the reference's
``dist_reduce_fx='sum'`` / pickle-to-tmpdir gathers,
ref: occupancy/apis/test.py:226-273).

Semantics preserved exactly:
- voxels with target label 255 are ignored: the reference zeroes both pred and
  target there (ssc_metric.py:108-109,140-141), which for the binary
  completion metric makes them true negatives and for the semantic metric only
  perturbs class 0, which is excluded from mIoU. We mask them out, which is
  numerically identical for every reported number.
- completion metric: occupied = (label > 0) for both pred and target.
- ``compute``: precision/recall/IoU for completion; per-class IoU with +1e-5
  denominator smoothing; mIoU over classes 1..C-1 (ssc_metric.py:87-102).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

NUM_CLASSES = 20


def empty_state(num_classes: int = NUM_CLASSES) -> Dict[str, jnp.ndarray]:
    """Fresh metric state. All leaves are float32 so psum is exact for counts
    well below 2**24; voxel counts per eval run fit comfortably in float64 on
    host — we keep device state in int32-safe float32 and finalize on host."""
    return {
        "tps": jnp.zeros((num_classes,), jnp.float32),
        "fps": jnp.zeros((num_classes,), jnp.float32),
        "fns": jnp.zeros((num_classes,), jnp.float32),
        "completion_tp": jnp.zeros((), jnp.float32),
        "completion_fp": jnp.zeros((), jnp.float32),
        "completion_fn": jnp.zeros((), jnp.float32),
    }


def update_state(
    state: Dict[str, jnp.ndarray],
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int = NUM_CLASSES,
) -> Dict[str, jnp.ndarray]:
    """Accumulate one batch of predictions.

    Args:
      pred: [...] int class predictions (argmax already applied).
      target: [...] int labels, 255 = ignore.
    """
    pred = pred.reshape(-1).astype(jnp.int32)
    target = target.reshape(-1).astype(jnp.int32)
    valid = target != 255

    # Binary completion counts (ref ssc_metric.py:104-135).
    p_occ = (pred > 0) & valid
    t_occ = (target > 0) & valid
    comp_tp = jnp.sum(p_occ & t_occ).astype(jnp.float32)
    comp_fp = jnp.sum(p_occ & ~t_occ).astype(jnp.float32)
    comp_fn = jnp.sum(~p_occ & t_occ).astype(jnp.float32)

    # Full confusion matrix in one bincount (ref loops ssc_metric.py:161-167).
    flat = jnp.where(valid, target * num_classes + pred, num_classes * num_classes)
    hist = jnp.bincount(flat, length=num_classes * num_classes + 1)[:-1]
    cm = hist.reshape(num_classes, num_classes).astype(jnp.float32)
    tp = jnp.diagonal(cm)
    fp = jnp.sum(cm, axis=0) - tp  # predicted j but true != j
    fn = jnp.sum(cm, axis=1) - tp  # true j but predicted != j

    return {
        "tps": state["tps"] + tp,
        "fps": state["fps"] + fp,
        "fns": state["fns"] + fn,
        "completion_tp": state["completion_tp"] + comp_tp,
        "completion_fp": state["completion_fp"] + comp_fp,
        "completion_fn": state["completion_fn"] + comp_fn,
    }


def reduce_state(state, axis_name: str):
    """Cross-device sum of the metric state (inside pmap/shard_map)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), state)


def reduce_state_host(states) -> Dict[str, jnp.ndarray]:
    """Host-side sum of per-shard metric states (replaces the reference's
    pickle-to-tmpdir rank gather, ref occupancy/apis/test.py:226-273).
    ``states``: iterable of state pytrees from different data shards."""
    states = list(states)
    return jax.tree.map(lambda *xs: sum(xs[1:], start=xs[0]), *states)


def all_processes_state(state) -> Dict[str, jnp.ndarray]:
    """Sum the metric state across every JAX process so each host computes
    identical final metrics (and identical best-checkpoint decisions).

    The reference gathered per-rank result tuples through pickle files on a
    shared filesystem (ref test.py:226-273) + ``dist.all_reduce`` for the
    histogram (:221); here the state is a tiny fixed pytree, so one
    ``process_allgather`` + host sum replaces both. No-op single-process.
    """
    if jax.process_count() == 1:
        return state
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(state)
    return jax.tree.map(lambda x: x.sum(axis=0), gathered)


def compute(state: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Final scores. ref: ssc_metric.py:87-102."""
    tp = state["completion_tp"]
    fp = state["completion_fp"]
    fn = state["completion_fn"]
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    iou = tp / (tp + fp + fn)
    iou_ssc = state["tps"] / (state["tps"] + state["fps"] + state["fns"] + 1e-5)
    return {
        "precision": precision,
        "recall": recall,
        "iou": iou,
        "iou_ssc": iou_ssc,
        "iou_ssc_mean": jnp.mean(iou_ssc[1:]),
    }


def evaluate_dict(state, class_names) -> Dict[str, float]:
    """Flat percentage dict with the reference's key naming, including the
    composite sort key. ref: datasets/semantic_kitti_lss_dataset.py:231-287."""
    scores = jax.device_get(compute(state))
    res = {
        "SC_Precision": float(scores["precision"]),
        "SC_Recall": float(scores["recall"]),
        "SC_IoU": float(scores["iou"]),
        "SSC_mIoU": float(scores["iou_ssc_mean"]),
    }
    for name, val in zip(class_names, scores["iou_ssc"].tolist()):
        res[f"SSC_{name}_IoU"] = float(val)
    out = {f"semkitti_{k}": round(v * 100, 2) for k, v in res.items()}
    out["semkitti_combined_IoU"] = out["semkitti_SC_IoU"] + out["semkitti_SSC_mIoU"]
    return out
