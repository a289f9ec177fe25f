"""Deformable convolution (DCNv1) as gather-based bilinear sampling.

The reference's active DepthNet uses the mmcv CUDA ``DCN`` op
(ref: ViewTransformerLSSBEVDepth.py:490-498: 3x3, padding 1, conv groups 4,
offsets predicted by a zero-initialized internal conv). On TPU the op
decomposes into, per kernel tap, one bilinear gather at learned offsets and
one grouped matmul — 9 gathers + 9 MXU contractions instead of an im2col
scatter. The tap loop is a static Python unroll (9 iterations), which XLA
pipelines; no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def bilinear_sample_nhwc(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray):
    """Sample [B, H, W, C] at fractional (y, x) with zero padding.

    Args:
      img: [B, H, W, C].
      y, x: [B, Ho, Wo] fractional pixel coordinates.
    Returns:
      [B, Ho, Wo, C].
    """
    b, h, w, c = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy1 = (y - y0).astype(img.dtype)
    wx1 = (x - x0).astype(img.dtype)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yi, xi, wgt):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat_idx = yc * w + xc  # [B, Ho, Wo]
        img_flat = img.reshape(b, h * w, c)
        gathered = jnp.take_along_axis(
            img_flat,
            flat_idx.reshape(b, -1, 1),
            axis=1,
        ).reshape(*flat_idx.shape, c)
        return gathered * (wgt * inside.astype(img.dtype))[..., None]

    out = corner(y0i, x0i, (1 - wy1) * (1 - wx1))
    out += corner(y0i, x0i + 1, (1 - wy1) * wx1)
    out += corner(y0i + 1, x0i, wy1 * (1 - wx1))
    out += corner(y0i + 1, x0i + 1, wy1 * wx1)
    return out


def deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    weights: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    groups: int = 1,
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 deformable convolution.

    Args:
      x: [B, H, W, Cin].
      offsets: [B, H, W, 2 * K] with K = 9 taps, (dy, dx) pairs in tap order
        (row-major over the 3x3 kernel) — mmcv DCNv1 layout.
      weights: [K, Cin // groups, Cout] tap-major kernel.
      bias: optional [Cout].
      groups: conv groups (active config: 4).
    Returns:
      [B, H, W, Cout].
    """
    b, h, w, cin = x.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    assert cin % groups == 0 and cout % groups == 0

    base_y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    offsets = offsets.astype(jnp.float32).reshape(b, h, w, k, 2)

    out = jnp.zeros((b, h, w, cout), dtype=x.dtype)
    w_g = weights.reshape(k, cin // groups, groups, cout // groups)
    kh = kw = int(round(k ** 0.5))
    for tap in range(k):
        ky, kx = tap // kw, tap % kw
        dy = offsets[..., tap, 0]
        dx = offsets[..., tap, 1]
        sy = base_y + (ky - (kh - 1) / 2) + dy
        sx = base_x + (kx - (kw - 1) / 2) + dx
        sampled = bilinear_sample_nhwc(x, sy, sx)  # [B, H, W, Cin]
        sampled = sampled.reshape(b, h, w, groups, cin // groups)
        out = out + jnp.einsum(
            "bhwgi,igo->bhwgo", sampled, w_g[tap],
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, cout).astype(out.dtype)

    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
