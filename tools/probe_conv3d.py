#!/usr/bin/env python
"""On-chip probe: 3x3x3 conv3d lowering strategies for the 32-channel cost
volumes (the dominant view-stage cost; see PERF.md).

Hypothesis: XLA's conv3d with C_out=32 wastes 3/4 of the MXU output lanes.
Folding the 3 depth taps into output channels (one conv2d C_in->3*C_out over
each depth slice, then a shift-add over depth) is mathematically exact and
triples lane occupancy at zero extra FLOPs.

Usage: python tools/probe_conv3d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import timeit, dispatch_overhead  # noqa: E402


def conv3d(x, w):
    # x: [B, D, H, W, Ci], w: [3,3,3,Ci,Co]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def conv3d_zpack(x, w):
    """Exact 3x3x3 conv via per-slice conv2d with dz folded into out-channels.

    y[d] = sum_dz W[dz] *2d x[d+dz]  (dz in {-1,0,1}, zero-padded)
    z[e, g] = W2d[g] *2d x[e], g = dz+1;  y[d] = sum_g z[d+g-1, g]
    """
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    # [3,3,3,Ci,Co] -> [3,3,Ci, 3*Co] with out block g = dz index
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 3 * co)
    xs = x.reshape(b * d, h, wd, ci)
    z = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(b, d, h, wd, 3, co)
    zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    # cross-correlation: y[d] = sum_kd z[d + kd - 1, g=kd]
    return zp[:, 0:d, ..., 0, :] + zp[:, 1:d + 1, ..., 1, :] \
        + zp[:, 2:d + 2, ..., 2, :]


def conv3d_zpack_w(x, w):
    """Same trick but folding the 3 *W* taps instead (conv over (D,H) with
    kernel (3,3), C_in -> 3*C_out, shift-add over W)."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    # w: [kd,kh,kw,ci,co] -> 2d kernel (kd,kh) with out block g = kw index
    w2 = jnp.transpose(w, (0, 1, 3, 2, 4)).reshape(3, 3, ci, 3 * co)
    xs = jnp.transpose(x, (0, 3, 1, 2, 4)).reshape(b * wd, d, h, ci)
    z = jax.lax.conv_general_dilated(
        xs, w2, window_strides=(1, 1), padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(b, wd, d, h, 3, co)
    zp = jnp.pad(z, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    y = zp[:, 0:wd, ..., 0, :] + zp[:, 1:wd + 1, ..., 1, :] \
        + zp[:, 2:wd + 2, ..., 2, :]
    return jnp.transpose(y, (0, 2, 3, 1, 4))


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    for (ci, co, D, H, W) in [(32, 32, 112, 48, 160), (64, 64, 56, 24, 80),
                              (2, 32, 112, 48, 160), (32, 1, 112, 48, 160)]:
        x = jnp.asarray(rng.randn(1, D, H, W, ci), dt)
        w = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.05, dt)
        gflop = 2 * D * H * W * ci * 27 * co / 1e9

        t0 = timeit(conv3d, x, w)
        t1 = timeit(conv3d_zpack, x, w)
        t2 = timeit(conv3d_zpack_w, x, w)

        # numerics
        y0 = np.asarray(conv3d(x, w), np.float32)
        y1 = np.asarray(conv3d_zpack(x, w), np.float32)
        y2 = np.asarray(conv3d_zpack_w(x, w), np.float32)
        scale = np.abs(y0).max() + 1e-6
        err1 = np.abs(y1 - y0).max() / scale
        err2 = np.abs(y2 - y0).max() / scale
        print(
            f"[{ci:3d}->{co:3d} @ {D}x{H}x{W}] {gflop:6.1f} GF | "
            f"conv3d {t0:6.2f} ms ({gflop/t0:5.1f} TF/s) | "
            f"zpack-d {t1:6.2f} ms ({gflop/max(t1,1e-3):5.1f} TF/s, "
            f"err {err1:.1e}) | "
            f"zpack-w {t2:6.2f} ms ({gflop/max(t2,1e-3):5.1f} TF/s, "
            f"err {err2:.1e})",
            flush=True,
        )


if __name__ == "__main__":
    main()
