#!/usr/bin/env python
"""On-chip probe: bilinear-gather strategies for the deformable conv.

Current: 9 taps x 4 corner row-gathers (36 take_along_axis calls).
Variants pack corners into channels so fewer, fatter gathers run:
  A: one flat gather for all taps+corners (36*HW rows, C channels)
  B: corner-packed: per tap one gather of 4C channels (9 gathers)
  C: corner-packed + tap-stacked: one gather of [9*HW, 4C]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import timeit, dispatch_overhead  # noqa: E402

B, H, W, C = 1, 48, 160, 640
K, G = 9, 4


def make_inputs(rng, dt):
    x = jnp.asarray(rng.randn(B, H, W, C), dt)
    offsets = jnp.asarray(rng.randn(B, H, W, 2 * K) * 1.5, jnp.float32)
    weights = jnp.asarray(rng.randn(K, C // G, C) * 0.02, dt)
    return x, offsets, weights


def current(x, offsets, weights):
    from stereoscene_tpu.ops.deform_conv import deform_conv2d
    return deform_conv2d(x, offsets, weights, None, groups=G)


def corner_packed(x, offsets, weights):
    """Pack the 2x2 bilinear corners into channels: one row-gather per tap of
    4C channels; lerp weights applied per block. Exact (zero padding).

    The pack is built from a spatially 1-padded source so a clipped base
    index never aliases valid data of a neighboring corner; validity masks
    use the unclipped indices."""
    b, h, w, c = x.shape
    co = weights.shape[-1]
    xp2 = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # xq[yy, xx] = corners of base (yy-1, xx-1); yy in [0, h], xx in [0, w]
    xq = jnp.concatenate(
        [xp2[:, 0:h + 1, 0:w + 1], xp2[:, 0:h + 1, 1:w + 2],
         xp2[:, 1:h + 2, 0:w + 1], xp2[:, 1:h + 2, 1:w + 2]], axis=-1,
    ).reshape(b, (h + 1) * (w + 1), 4 * c)

    base_y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    off = offsets.astype(jnp.float32).reshape(b, h, w, K, 2)
    w_g = weights.reshape(K, c // G, G, co // G)

    out = jnp.zeros((b, h, w, co), dtype=jnp.float32)
    for tap in range(K):
        ky, kx = tap // 3, tap % 3
        sy = base_y + (ky - 1) + off[..., tap, 0]
        sx = base_x + (kx - 1) + off[..., tap, 1]
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        wy = (sy - y0).astype(x.dtype)
        wx = (sx - x0).astype(x.dtype)
        y0i = y0.astype(jnp.int32)
        x0i = x0.astype(jnp.int32)
        vy0 = ((y0i >= 0) & (y0i < h)).astype(x.dtype)
        vy1 = ((y0i + 1 >= 0) & (y0i + 1 < h)).astype(x.dtype)
        vx0 = ((x0i >= 0) & (x0i < w)).astype(x.dtype)
        vx1 = ((x0i + 1 >= 0) & (x0i + 1 < w)).astype(x.dtype)
        yg = jnp.clip(y0i, -1, h - 1) + 1
        xg = jnp.clip(x0i, -1, w - 1) + 1
        flat = (yg * (w + 1) + xg).reshape(b, -1, 1)
        g = jnp.take_along_axis(xq, flat, axis=1).reshape(b, h, w, 4, c)
        w00 = (1 - wy) * (1 - wx) * vy0 * vx0
        w01 = (1 - wy) * wx * vy0 * vx1
        w10 = wy * (1 - wx) * vy1 * vx0
        w11 = wy * wx * vy1 * vx1
        sampled = (g[..., 0, :] * w00[..., None] + g[..., 1, :] * w01[..., None]
                   + g[..., 2, :] * w10[..., None] + g[..., 3, :] * w11[..., None])
        sampled = sampled.reshape(b, h, w, G, c // G)
        out = out + jnp.einsum(
            "bhwgi,igo->bhwgo", sampled, w_g[tap],
            preferred_element_type=jnp.float32,
        ).reshape(b, h, w, co)
    return out.astype(x.dtype)


def main():
    rng = np.random.RandomState(0)
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)
    x, offsets, weights = make_inputs(rng, jnp.bfloat16)

    t0 = timeit(lambda a: current(a, offsets, weights), x)
    t1 = timeit(lambda a: corner_packed(a, offsets, weights), x)
    y0 = np.asarray(current(x, offsets, weights), np.float32)
    y1 = np.asarray(corner_packed(x, offsets, weights), np.float32)
    err = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-6)
    print(f"current 36-gather: {t0:.2f} ms | corner-packed 9-gather: "
          f"{t1:.2f} ms (err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
