"""Multi-scale deformable attention as pure gathers (MSDeformAttn).

TPU equivalent of the CUDA ``MultiScaleDeformableAttnFunction``
(ref: bevformer/modules/multi_scale_deformable_attn_function.py:14,89, used
by the BEVFormer/Mask2Former alternates): for each query, sample each value
level at P learned locations with bilinear interpolation and combine with
learned attention weights. The CUDA op's im2col scatter becomes one batched
gather per level + a weighted sum — all static-shape, fusable XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_sample_level(
    value: jnp.ndarray, loc: jnp.ndarray
) -> jnp.ndarray:
    """value: [B, H, W, heads, c]; loc: [B, Q, heads, P, 2] normalized to
    [0, 1] (align_corners=False grid, matching the CUDA op). Returns
    [B, Q, heads, P, c]."""
    b, h, w, heads, c = value.shape
    # normalized -> pixel coords (align_corners=False convention)
    px = loc[..., 0] * w - 0.5
    py = loc[..., 1] * h - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = value.transpose(0, 3, 1, 2, 4).reshape(b, heads, h * w, c)

    def corner(xi, yi, wgt):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        idx = yc * w + xc  # [B, Q, heads, P]
        idx_h = idx.transpose(0, 2, 1, 3).reshape(b, heads, -1)  # [B,hd,Q*P]
        g = jnp.take_along_axis(flat, idx_h[..., None], axis=2)
        q, p = loc.shape[1], loc.shape[3]
        g = g.reshape(b, heads, q, p, c).transpose(0, 2, 1, 3, 4)
        return g * (wgt * inside[..., None].astype(value.dtype))

    out = corner(x0i, y0i, (1 - fx) * (1 - fy))
    out += corner(x0i + 1, y0i, fx * (1 - fy))
    out += corner(x0i, y0i + 1, (1 - fx) * fy)
    out += corner(x0i + 1, y0i + 1, fx * fy)
    return out


def msdeform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Args:
      value: [B, sum(H*W), C] flattened multi-level values.
      spatial_shapes: static list of (H, W) per level.
      sampling_locations: [B, Q, heads, levels, P, 2] in [0, 1].
      attention_weights: [B, Q, heads, levels, P] (already softmaxed).
    Returns: [B, Q, C].
    """
    b, _, c = value.shape
    ch = c // num_heads
    outputs = []
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value[:, offset : offset + h * w].reshape(b, h, w, num_heads, ch)
        offset += h * w
        sampled = _bilinear_sample_level(
            v, sampling_locations[:, :, :, lvl]
        )  # [B, Q, heads, P, ch]
        outputs.append(sampled * attention_weights[:, :, :, lvl, :, None])
    out = sum(outputs).sum(axis=3)  # sum over points
    return out.reshape(b, -1, num_heads * ch)


def _trilinear_sample_level(
    value: jnp.ndarray, loc: jnp.ndarray
) -> jnp.ndarray:
    """value: [B, X, Y, Z, heads, c]; loc: [B, Q, heads, P, 3] normalized to
    [0, 1] (align_corners=False half-pixel grid, (x, y, z) order). Returns
    [B, Q, heads, P, c]."""
    b, x, y, z, heads, c = value.shape
    px = loc[..., 0] * x - 0.5
    py = loc[..., 1] * y - 0.5
    pz = loc[..., 2] * z - 0.5
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    z0 = jnp.floor(pz)
    fx = (px - x0)[..., None]
    fy = (py - y0)[..., None]
    fz = (pz - z0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    flat = value.transpose(0, 4, 1, 2, 3, 5).reshape(b, heads, x * y * z, c)
    q, p = loc.shape[1], loc.shape[3]

    def corner(xi, yi, zi, wgt):
        inside = ((xi >= 0) & (xi < x) & (yi >= 0) & (yi < y)
                  & (zi >= 0) & (zi < z))
        xc = jnp.clip(xi, 0, x - 1)
        yc = jnp.clip(yi, 0, y - 1)
        zc = jnp.clip(zi, 0, z - 1)
        idx = (xc * y + yc) * z + zc  # [B, Q, heads, P]
        idx_h = idx.transpose(0, 2, 1, 3).reshape(b, heads, -1)
        g = jnp.take_along_axis(flat, idx_h[..., None], axis=2)
        g = g.reshape(b, heads, q, p, c).transpose(0, 2, 1, 3, 4)
        return g * (wgt * inside[..., None].astype(value.dtype))

    out = corner(x0i, y0i, z0i, (1 - fx) * (1 - fy) * (1 - fz))
    out += corner(x0i + 1, y0i, z0i, fx * (1 - fy) * (1 - fz))
    out += corner(x0i, y0i + 1, z0i, (1 - fx) * fy * (1 - fz))
    out += corner(x0i + 1, y0i + 1, z0i, fx * fy * (1 - fz))
    out += corner(x0i, y0i, z0i + 1, (1 - fx) * (1 - fy) * fz)
    out += corner(x0i + 1, y0i, z0i + 1, fx * (1 - fy) * fz)
    out += corner(x0i, y0i + 1, z0i + 1, (1 - fx) * fy * fz)
    out += corner(x0i + 1, y0i + 1, z0i + 1, fx * fy * fz)
    return out


def msdeform_attn_3d(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """3D multi-scale deformable attention (trilinear sampling).

    The occupancy pixel decoder's encoder uses this over voxel levels
    (ref: maskformer/pixel_decoders/occupancy_pixel_decoder.py:16-290, which
    drives the CUDA MultiScaleDeformableAttention over flattened 3D grids).

    Args:
      value: [B, sum(X*Y*Z), C] flattened multi-level voxel values.
      spatial_shapes: static list of (X, Y, Z) per level.
      sampling_locations: [B, Q, heads, levels, P, 3] in [0, 1].
      attention_weights: [B, Q, heads, levels, P] (already softmaxed).
    Returns: [B, Q, C].
    """
    b, _, c = value.shape
    ch = c // num_heads
    outputs = []
    offset = 0
    for lvl, (x, y, z) in enumerate(spatial_shapes):
        v = value[:, offset: offset + x * y * z].reshape(
            b, x, y, z, num_heads, ch)
        offset += x * y * z
        sampled = _trilinear_sample_level(v, sampling_locations[:, :, :, lvl])
        outputs.append(sampled * attention_weights[:, :, :, lvl, :, None])
    out = sum(outputs).sum(axis=3)
    return out.reshape(b, -1, num_heads * ch)
