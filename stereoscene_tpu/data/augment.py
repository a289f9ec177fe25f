"""Device-side augmentations.

- ``grid_mask``: structured grid dropout on input images
  (ref: models/utils/grid_mask.py:70-124; constructed with
  rotate=1, ratio=0.5, mode=1, prob=0.7 at bevdepth_occupancy.py:36-37 and
  disabled by default). Implemented as a pure jnp function usable inside the
  jitted train step (the reference applies it on device too).
- ``bev_transform_matrix``: the BDA rotation/flip matrix about the grid
  center (ref: datasets/pipelines/loading_semkitti.py:304-356). The voxel
  label rotation itself stays a host-side op (scipy-style nearest-neighbor
  rotate) in the pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_mask(
    imgs: jnp.ndarray,
    rng: jax.Array,
    d_range: Tuple[int, int] = (96, 224),
    ratio: float = 0.5,
    prob: float = 0.7,
    mode: int = 1,
) -> jnp.ndarray:
    """Apply grid dropout to [B, H, W, C] images.

    A random grid period d, offsets (sx, sy); squares of side ratio*d are
    masked (mode=1 keeps the squares' complement, matching the reference's
    offset-free mode-1 behavior)."""
    b, h, w, _ = imgs.shape
    k_apply, k_d, k_sx, k_sy = jax.random.split(rng, 4)
    apply = jax.random.bernoulli(k_apply, prob, (b,))
    d = jax.random.randint(k_d, (b,), d_range[0], d_range[1])
    sx = jax.random.randint(k_sx, (b,), 0, d_range[1])
    sy = jax.random.randint(k_sy, (b,), 0, d_range[1])

    ys = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    dd = d[:, None, None]
    keep_len = jnp.ceil(ratio * d).astype(jnp.int32)[:, None, None]
    in_sq = (((ys + sy[:, None, None]) % dd) < keep_len) & (
        ((xs + sx[:, None, None]) % dd) < keep_len
    )
    mask = in_sq if mode == 1 else ~in_sq
    mask = jnp.where(apply[:, None, None], mask, True)
    return imgs * mask[..., None].astype(imgs.dtype)


def bev_transform_matrix(
    rotate_deg: float,
    flip_dx: bool,
    flip_dy: bool,
    transform_center: np.ndarray,
) -> np.ndarray:
    """4x4 BDA matrix: translate-to-center, flips, rotation, translate-back
    (ref loading_semkitti.py:304-341)."""
    t_norm = np.eye(4, dtype=np.float32)
    t_norm[:3, 3] = -np.asarray(transform_center, np.float32)
    t_denorm = np.eye(4, dtype=np.float32)
    t_denorm[:3, 3] = np.asarray(transform_center, np.float32)

    a = np.deg2rad(rotate_deg)
    rot = np.eye(4, dtype=np.float32)
    rot[0, 0] = np.cos(a)
    rot[0, 1] = -np.sin(a)
    rot[1, 0] = np.sin(a)
    rot[1, 1] = np.cos(a)

    flip = np.eye(4, dtype=np.float32)
    if flip_dx:
        flip[0, 0] = -1
    if flip_dy:
        flip[1, 1] = -1

    return t_denorm @ flip @ rot @ t_norm


def bev_transform_labels(
    labels: np.ndarray, rotate_deg: float, flip_dx: bool, flip_dy: bool
) -> np.ndarray:
    """Host-side voxel-label counterpart of the BDA matrix (nearest-neighbor
    rotation about the XY grid center, fill 255; then flips).
    ref loading_semkitti.py:342-356"""
    import scipy.ndimage

    out = labels.astype(np.uint8)
    if not np.isclose(rotate_deg, 0):
        out = scipy.ndimage.rotate(
            out, rotate_deg, axes=(0, 1), reshape=False, order=0,
            mode="constant", cval=255,
        )
    if flip_dy:
        out = out[:, ::-1]
    if flip_dx:
        out = out[::-1]
    return np.ascontiguousarray(out)
