#!/usr/bin/env python
"""On-chip probe: 3x3x3 stride-2 ConvTranspose lowering via depth-phase
decomposition with depth taps folded into output channels.

torch ConvTranspose3d(k=3, s=2, p=1, op=1): out = 2*in. Writing the
lhs-dilated conv out[o] = sum_k w'[k] xd[o + k - 1] (w' spatially flipped,
xd zero-dilated) and splitting by output parity in D:
  out[2m]   = w'[1] *T2d x[m]
  out[2m+1] = w'[0] *T2d x[m] + w'[2] *T2d x[m + 1]
where *T2d is the 2D stride-2 transposed conv over (H, W). The three 2D
transposed convs share an input so they fold into ONE with 3*C_out output
channels; the result interleaves along D (major axis — cheap relayout,
unlike full 8-phase subpixel decomposition which interleaves along W).
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


def deconv3d_ref(x, w):
    """lhs-dilated conv == torch ConvTranspose3d(k3, s2, p1, op1).
    x: [B, D, H, W, Ci]; w torch-layout flipped already as [3,3,3,Ci,Co]."""
    wf = w[::-1, ::-1, ::-1]
    return jax.lax.conv_general_dilated(
        x, wf, window_strides=(1, 1, 1),
        padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def deconv3d_dphase(x, w):
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    # fold the 3 depth taps into output channels of one 2D transposed conv
    # w2[kh,kw,ci, kd*co+oc] ; 2D transposed conv = lhs-dilated conv with
    # spatially flipped (kh,kw) kernel
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 3 * co)
    w2f = w2[::-1, ::-1]
    xs = x.reshape(b * d, h, wd, ci)
    z = jax.lax.conv_general_dilated(
        xs, w2f, window_strides=(1, 1),
        padding=[(1, 2)] * 2, lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(b, d, 2 * h, 2 * wd, 3, co)
    # out[2m] = z[m, kd=1]; out[2m+1] = z[m, kd=2] + z[m+1, kd=0]
    even = z[:, :, :, :, 1, :]
    zp = jnp.pad(z, ((0, 0), (0, 1)) + ((0, 0),) * 4)
    odd = zp[:, 0:d, :, :, 2, :] + zp[:, 1:d + 1, :, :, 0, :]
    out = jnp.stack([even, odd], axis=2)  # [B, D, 2, 2H, 2W, Co]
    return out.reshape(b, 2 * d, 2 * h, 2 * wd, co)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    # hourglass conv6: 64 -> 32 to full res; conv5: 128 -> 64 to half res
    for (ci, co, D, H, W) in [(64, 32, 56, 24, 80), (128, 64, 28, 12, 40)]:
        x = jnp.asarray(rng.randn(1, D, H, W, ci), dt)
        w = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.05, dt)
        t0 = timeit(deconv3d_ref, x, w)
        t1 = timeit(deconv3d_dphase, x, w)
        y0 = np.asarray(deconv3d_ref(x, w), np.float32)
        y1 = np.asarray(deconv3d_dphase(x, w), np.float32)
        err = np.abs(y1 - y0).max() / (np.abs(y0).max() + 1e-6)
        print(f"[{ci}->{co} @ {D}x{H}x{W} -> x2] lhs-dilated {t0:6.2f} ms | "
              f"d-phase zpack {t1:6.2f} ms (err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
