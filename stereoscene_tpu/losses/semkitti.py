"""SemanticKITTI SSC losses, numerically matching the reference.

Functional JAX rebuilds of projects/mmdet3d_plugin/utils/semkitti.py:
- class frequencies / 1/log(freq) weights   (semkitti.py:8-31)
- ``ce_ssc_loss``     weighted CE, ignore 255 (semkitti.py:140-149)
- ``sem_scal_loss``   per-class precision/recall/specificity BCE
                      (semkitti.py:93-137)
- ``geo_scal_loss``   binary occupancy precision/recall/specificity BCE
                      (semkitti.py:67-91)
- ``kl_sep``          KL on nonzero classes (semkitti.py:57-64)
- ``ohem_ce_ssc_loss``top-k hard example CE (semkitti.py:151-185)

All reductions happen in float32 regardless of the input dtype (the reference
wraps these in ``force_fp32``/autocast guards).

Shape convention: ``logits`` are channels-last ``[B, X, Y, Z, C]`` (the
reference uses ``[B, C, X, Y, Z]``; channels-last is the TPU-native layout).
``target`` is ``[B, X, Y, Z]`` int with 255 = ignore.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ref: semkitti.py:8-31
SEMANTIC_KITTI_CLASS_FREQUENCIES = np.array(
    [
        5.41773033e09,
        1.57835390e07,
        1.25136000e05,
        1.18809000e05,
        6.46799000e05,
        8.21951000e05,
        2.62978000e05,
        2.83696000e05,
        2.04750000e05,
        6.16887030e07,
        4.50296100e06,
        4.48836500e07,
        2.26992300e06,
        5.68402180e07,
        1.57196520e07,
        1.58442623e08,
        2.06162300e06,
        3.69705220e07,
        1.15198800e06,
        3.34146000e05,
    ]
)

# ref: semkitti.py:33-54
KITTI_CLASS_NAMES = [
    "empty",
    "car",
    "bicycle",
    "motorcycle",
    "truck",
    "other-vehicle",
    "person",
    "bicyclist",
    "motorcyclist",
    "road",
    "parking",
    "sidewalk",
    "other-ground",
    "building",
    "fence",
    "vegetation",
    "trunk",
    "terrain",
    "pole",
    "traffic-sign",
]

_EPS = 1e-12
# torch.nn.functional.binary_cross_entropy clamps log terms at -100.
_LOG_CLAMP = -100.0


def class_weights_from_frequencies(freqs: np.ndarray = None) -> np.ndarray:
    """1 / log(freq + 0.001) class weights (ref: occhead.py:155-157)."""
    if freqs is None:
        freqs = SEMANTIC_KITTI_CLASS_FREQUENCIES
    return (1.0 / np.log(freqs + 0.001)).astype(np.float32)


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(jnp.log(jnp.maximum(x, _EPS)), _LOG_CLAMP)


def _bce_with_one_target(p: jnp.ndarray) -> jnp.ndarray:
    """binary_cross_entropy(p, 1) == -log(p), with torch-style clamping."""
    return -_safe_log(p)


def ce_ssc_loss(
    logits: jnp.ndarray, target: jnp.ndarray, class_weights: jnp.ndarray
) -> jnp.ndarray:
    """Weighted cross-entropy, ignore_index=255, torch 'mean' reduction
    (sum of weighted losses / sum of sample weights).

    ref: semkitti.py:140-149
    """
    num_classes = logits.shape[-1]
    logits = logits.astype(jnp.float32).reshape(-1, num_classes)
    target = target.reshape(-1).astype(jnp.int32)
    valid = target != 255
    safe_target = jnp.where(valid, target, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_target[:, None], axis=-1)[:, 0]
    w = jnp.asarray(class_weights, jnp.float32)[safe_target]
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), _EPS)


def geo_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary occupancy precision/recall/specificity affinity loss.

    ref: semkitti.py:67-91
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    empty_probs = probs[..., 0].reshape(-1)
    nonempty_probs = 1.0 - empty_probs

    target = target.reshape(-1)
    valid = (target != 255).astype(jnp.float32)
    nonempty_target = ((target != 0) & (target != 255)).astype(jnp.float32)
    empty_target = valid - nonempty_target

    nonempty_probs = nonempty_probs * valid
    empty_probs = empty_probs * valid

    intersection = jnp.sum(nonempty_target * nonempty_probs)
    precision = intersection / jnp.maximum(jnp.sum(nonempty_probs), _EPS)
    recall = intersection / jnp.maximum(jnp.sum(nonempty_target), _EPS)
    spec = jnp.sum(empty_target * empty_probs) / jnp.maximum(
        jnp.sum(empty_target), _EPS
    )
    return (
        _bce_with_one_target(precision)
        + _bce_with_one_target(recall)
        + _bce_with_one_target(spec)
    )


def sem_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-class precision/recall/specificity affinity loss, averaged over
    classes present in the (valid part of the) target.

    ref: semkitti.py:93-137. The reference skips the precision term when
    sum(p) == 0 and the specificity term when the class fills every valid
    voxel; those branches are reproduced with ``where`` masks.
    """
    num_classes = logits.shape[-1]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    probs = probs.reshape(-1, num_classes)
    target = target.reshape(-1)
    valid = target != 255
    validf = valid.astype(jnp.float32)

    # one-hot of target restricted to valid voxels: [V, C] via comparisons.
    class_ids = jnp.arange(num_classes, dtype=target.dtype)
    completion = (target[:, None] == class_ids[None, :]).astype(jnp.float32)
    completion = completion * validf[:, None]
    probs = probs * validf[:, None]

    nominator = jnp.sum(probs * completion, axis=0)  # [C]
    p_sum = jnp.sum(probs, axis=0)
    t_sum = jnp.sum(completion, axis=0)
    not_t_sum = jnp.sum(validf) - t_sum

    precision = nominator / jnp.maximum(p_sum, _EPS)
    recall = nominator / jnp.maximum(t_sum, _EPS)
    spec_nom = jnp.sum((1.0 - probs) * (1.0 - completion) * validf[:, None], axis=0)
    specificity = spec_nom / jnp.maximum(not_t_sum, _EPS)

    loss_c = jnp.where(p_sum > 0, _bce_with_one_target(precision), 0.0)
    loss_c += jnp.where(t_sum > 0, _bce_with_one_target(recall), 0.0)
    loss_c += jnp.where(not_t_sum > 0, _bce_with_one_target(specificity), 0.0)

    present = (t_sum > 0).astype(jnp.float32)
    return jnp.sum(loss_c * present) / jnp.maximum(jnp.sum(present), 1.0)


def kl_sep(p: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """KL divergence restricted to entries where target != 0.

    ref: semkitti.py:57-64 (torch F.kl_div(log(p), t, reduction='sum'))
    """
    p = p.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = (target != 0).astype(jnp.float32)
    per_elem = target * (_safe_log(target) - _safe_log(p))
    return jnp.sum(per_elem * mask)


def ohem_ce_ssc_loss(
    logits: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: jnp.ndarray,
    top_k: float = 0.25,
) -> jnp.ndarray:
    """Online hard-example mining CE: per sample, keep the top-k fraction of
    valid-voxel losses; normalize by the sum of their class weights.

    ref: semkitti.py:151-185. The reference takes
    ``int(num_valid * top_k)`` elements per batch item; under jit that count
    is data dependent, so we sort the full per-sample loss vector (invalid
    voxels get loss -inf) and build the keep mask from the *valid-count*
    computed on device, which reproduces the same selection.
    """
    num_classes = logits.shape[-1]
    b = logits.shape[0]
    logits = logits.astype(jnp.float32).reshape(b, -1, num_classes)
    target = target.reshape(b, -1).astype(jnp.int32)
    valid = target != 255
    safe_target = jnp.where(valid, target, 0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_target[..., None], axis=-1)[..., 0]
    w = jnp.asarray(class_weights, jnp.float32)[safe_target]
    per_voxel = jnp.where(valid, nll * w, -jnp.inf)

    order = jnp.argsort(per_voxel, axis=1)[:, ::-1]  # descending
    sorted_loss = jnp.take_along_axis(per_voxel, order, axis=1)
    sorted_w = jnp.take_along_axis(jnp.where(valid, w, 0.0), order, axis=1)

    n_valid = jnp.sum(valid, axis=1)
    k = jnp.floor(n_valid.astype(jnp.float32) * top_k).astype(jnp.int32)
    ranks = jnp.arange(per_voxel.shape[1])[None, :]
    keep = ranks < k[:, None]

    topk_sum = jnp.sum(jnp.where(keep, sorted_loss, 0.0))
    weight_sum = jnp.sum(jnp.where(keep, sorted_w, 0.0))
    return topk_sum / jnp.maximum(weight_sum, 1e-4)
