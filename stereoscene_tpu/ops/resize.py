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


def _upsample2x_axis(x: jnp.ndarray, ax: int) -> jnp.ndarray:
    """Exact 2x linear upsample (half-pixel centers) along one axis.

    ``jax.image.resize(method='linear')`` at an exact 2x factor reduces to a
    static two-tap stencil: out[2i] = 0.25*in[i-1] + 0.75*in[i] and
    out[2i+1] = 0.75*in[i] + 0.25*in[i+1], edges clamped. Expressing it as
    shift algebra (slices + interleave) avoids the gather-based resize
    lowering entirely — measured 0.3-2.7 ms vs several ms for the
    [256,256,32,20] flagship upsample (tools/probe_bev.py; max rel err
    1.4e-7 vs jax.image.resize, argmax agreement 1.0).
    """
    n = x.shape[ax]
    lo = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=ax),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=ax)], axis=ax)
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=ax),
         jax.lax.slice_in_dim(x, n - 1, n, axis=ax)], axis=ax)
    even = 0.25 * lo + 0.75 * x
    odd = 0.75 * x + 0.25 * hi
    st = jnp.stack([even, odd], axis=ax + 1)
    return st.reshape(x.shape[:ax] + (2 * n,) + x.shape[ax + 1:])


def resize_trilinear(
    x: jnp.ndarray, out_xyz: tuple[int, int, int]
) -> jnp.ndarray:
    """Trilinear resize of [..., X, Y, Z, C] to [..., X', Y', Z', C]."""
    # Fast path: axes that upsample by exactly 2x use the static two-tap
    # stencil (identical math to the general resize — linear interpolation
    # is axis-separable, so mixing per-axis implementations stays exact).
    nd = x.ndim
    axes = (nd - 4, nd - 3, nd - 2)
    sizes = list(x.shape)
    for ax, out_n in zip(axes, out_xyz):
        if out_n == 2 * sizes[ax]:
            x = _upsample2x_axis(x, ax)
            sizes[ax] = out_n
    if tuple(sizes[a] for a in axes) == tuple(out_xyz):
        return x
    out_shape = x.shape[:-4] + tuple(out_xyz) + (x.shape[-1],)
    return jax.image.resize(x, out_shape, method="linear").astype(x.dtype)
