"""Resize helpers with torch ``F.interpolate(..., align_corners=False)``
semantics (half-pixel centers), which is what the reference uses for the final
trilinear voxel upsample (ref: bevdepth_occupancy.py:293-294,
occhead.py:291-294). ``jax.image.resize(method='linear')`` already implements
half-pixel sampling, so these are thin shape-handling wrappers that keep the
channel axis untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of [..., H, W, C] to [..., out_h, out_w, C]."""
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1], x.shape[-1])
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)


def resize_trilinear(
    x: jnp.ndarray, out_xyz: tuple[int, int, int]
) -> jnp.ndarray:
    """Trilinear resize of [..., X, Y, Z, C] to [..., X', Y', Z', C]."""
    out_shape = x.shape[:-4] + tuple(out_xyz) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)
