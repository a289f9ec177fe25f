"""Lovasz-softmax loss in JAX.

Rebuild of the Lovasz extension of the Jaccard index used by the reference
(ref: projects/mmdet3d_plugin/occupancy/dense_heads/lovasz_softmax.py, vendored
from the public maxim-berman implementation; wired with weight 0.0 in the
active config, stereoscene.py:120).

jit-compatible treatment of ``ignore``: masked voxels are given error 0 and
foreground 0, which sorts them into the zero-error tail where the
Lovasz gradient multiplies a zero error — identical loss to physically
removing them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_softmax(
    probs: jnp.ndarray,
    labels: jnp.ndarray,
    ignore: int | None = 255,
    classes: str = "present",
) -> jnp.ndarray:
    """Multi-class Lovasz-softmax loss.

    Args:
      probs: [..., C] class probabilities (softmax already applied).
      labels: [...] int labels.
      ignore: label to exclude.
      classes: 'present' averages only over classes present in the target;
        'all' averages over every class.
    """
    num_classes = probs.shape[-1]
    probs = probs.astype(jnp.float32).reshape(-1, num_classes)
    labels = labels.reshape(-1)
    valid = (
        jnp.ones_like(labels, dtype=bool) if ignore is None else labels != ignore
    )
    validf = valid.astype(jnp.float32)

    def class_loss(c):
        fg = ((labels == c) & valid).astype(jnp.float32)
        errors = jnp.where(valid, jnp.abs(fg - probs[:, c]), 0.0)
        order = jnp.argsort(errors)[::-1]
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        return jnp.dot(errors_sorted, _lovasz_grad(fg_sorted)), jnp.sum(fg) > 0

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    if classes == "present":
        presentf = present.astype(jnp.float32)
        return jnp.sum(losses * presentf) / jnp.maximum(jnp.sum(presentf), 1.0)
    return jnp.mean(losses)
