"""Depth-distribution supervision for the LSS lift.

Rebuild of the BCE depth loss path
(ref: ViewTransformerLSSVoxel.py:349-388 ``get_downsampled_gt_depth`` /
``get_bce_depth_loss``): the sparse LiDAR depth map is min-pooled to the
feature stride (zeros treated as +inf), quantized into the D depth bins as a
one-hot target, and the predicted per-pixel depth distribution is penalized
with binary cross-entropy on foreground pixels, normalized by the foreground
count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12
_LOG_CLAMP = -100.0


def downsample_gt_depth(
    gt_depths: jnp.ndarray,
    downsample: int,
    dbound: Tuple[float, float, float],
    num_depth: int,
) -> jnp.ndarray:
    """Min-pool sparse depth to feature resolution and one-hot bin it.

    Args:
      gt_depths: [B, N, H, W] metric depth, 0 = no return.
    Returns:
      one-hot [B*N*h*w, D] float32 targets (all-zero rows = background).

    ref: ViewTransformerLSSVoxel.py:349-373
    """
    b, n, h, w = gt_depths.shape
    d = downsample
    x = gt_depths.reshape(b * n, h // d, d, w // d, d)
    x = jnp.where(x == 0.0, 1e5, x)
    x = jnp.min(x, axis=(2, 4))  # [B*N, h, w]

    lo, _, step = dbound
    # bin index: [min - step/2, min + step/2] maps to bin 1 (0 = background)
    idx = (x - (lo - step / 2.0)) / step
    in_range = (idx < num_depth + 1) & (idx >= 0.0)
    idx = jnp.where(in_range, idx, 0.0).astype(jnp.int32)
    onehot = jax.nn.one_hot(idx.reshape(-1), num_depth + 1, dtype=jnp.float32)
    return onehot[:, 1:]


def bce_depth_loss(
    depth_labels: jnp.ndarray,
    depth_probs: jnp.ndarray,
    downsample: int,
    dbound: Tuple[float, float, float],
) -> jnp.ndarray:
    """Foreground-masked BCE between predicted depth distribution and one-hot
    binned LiDAR depth. ref: ViewTransformerLSSVoxel.py:375-388

    Args:
      depth_labels: [B, N, H, W] sparse metric depth at input resolution.
      depth_probs: [B*N, h, w, D] predicted softmax depth distribution
        (channels-last; the reference uses [B*N, D, h, w]).
    """
    num_depth = depth_probs.shape[-1]
    labels = downsample_gt_depth(depth_labels, downsample, dbound, num_depth)
    preds = depth_probs.astype(jnp.float32).reshape(-1, num_depth)

    fg = (jnp.max(labels, axis=1) > 0.0).astype(jnp.float32)
    p = jnp.clip(preds, _EPS, 1.0)
    one_minus = jnp.clip(1.0 - preds, _EPS, 1.0)
    bce = -(
        labels * jnp.maximum(jnp.log(p), _LOG_CLAMP)
        + (1.0 - labels) * jnp.maximum(jnp.log(one_minus), _LOG_CLAMP)
    )
    per_pixel = jnp.sum(bce, axis=1) * fg
    return jnp.sum(per_pixel) / jnp.maximum(jnp.sum(fg), 1.0)
