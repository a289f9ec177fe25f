#!/usr/bin/env python
"""Probe alternative depthwise-conv kernel-grad (dK) formulations.

Context: XLA GSPMD mis-reduces the kernel grad of feature-grouped convs on
multi-axis meshes (dK scaled by the unused mesh axis / garbage — see
models/efficientnet.py:depthwise_conv2d). The current custom VJP (K^2
strided-slice multiply-reduces) partitions correctly but faults the TPU
worker inside the full detector backward. This probe validates candidate
reformulations on the virtual ('data','space') CPU mesh:

  raw    — autodiff of the grouped conv (expected WRONG on the mesh: the
           bug signature this whole mechanism guards against)
  slice  — current custom backward (expected correct; TPU-faulting)
  tconv  — dK as a conv_general_dilated with batch_group_count=C,
           written with explicit dimension numbers
  gconv  — dK as a feature-grouped conv with dy as the kernel (B folded
           into feature groups)
  patch  — conv_general_dilated_patches + dot_general

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/probe_dwgrad.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stereoscene_tpu.models.efficientnet import _dw_raw, _same_pad
from stereoscene_tpu.parallel.mesh import make_mesh


def dk_slice(x, dy, kh, kw, stride, padding):
    """Current custom backward: K^2 strided-slice multiply-reduces."""
    oh, ow = dy.shape[1], dy.shape[2]
    xp = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)))
    dyf = dy.astype(jnp.float32)
    rows = []
    for i in range(kh):
        cols = []
        for j in range(kw):
            patch = jax.lax.slice(
                xp,
                (0, i, j, 0),
                (xp.shape[0], i + (oh - 1) * stride + 1,
                 j + (ow - 1) * stride + 1, xp.shape[3]),
                (1, stride, stride, 1),
            )
            cols.append(
                jnp.sum(patch.astype(jnp.float32) * dyf, axis=(0, 1, 2))
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)[:, :, None, :]


def dk_tconv(x, dy, kh, kw, stride, padding):
    """dK as one conv with batch_group_count=C (the classic transpose-rhs
    construction, written explicitly).

    lhs = x  [B,H,W,C]  read as  N=B spatial=H,W feature=C
    rhs = dy [B,oh,ow,C] read as a kernel [B, oh, ow, C]: I=B, spatial, O=C
    batch_group_count=C? -- no: for depthwise the construction is
    batch_group_count == feature_group_count == C with the *batch* dim of
    lhs acting as the contracted input-feature dim:
      lhs spec: feature<->batch swapped -> "CHWN"  (C is 'batch groups')
      rhs spec: dy as kernel with I=batch-of-dy, O=C
    out[kh,kw,1? ...]. Strides become rhs_dilation; kernel dilation becomes
    window strides (identity here).
    """
    b = x.shape[0]
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        dy.astype(jnp.float32),
        window_strides=(1, 1),
        padding=padding,
        lhs_dilation=(1, 1),
        rhs_dilation=(stride, stride),
        dimension_numbers=("CHWN", "HWNC", "CHWN"),
        feature_group_count=1,
        batch_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    # out spec "CHWN": [C_groups=C? ...] -- shape [C, kh, kw, B/...]
    return jnp.transpose(out, (1, 2, 3, 0))  # -> [kh, kw, 1, C]


def dk_gconv(x, dy, kh, kw, stride, padding):
    """dK as a feature-grouped conv: fold B into feature groups.

    lhs: x  -> [1, H, W, B*C]
    rhs: dy -> [oh, ow, 1, B*C] (as kernel), feature_group_count=B*C
    out: [1, kh, kw, B*C] -> sum over B -> [kh, kw, 1, C]
    """
    b, h, w, c = x.shape
    oh, ow = dy.shape[1], dy.shape[2]
    lhs = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h, w, b * c)
    rhs = jnp.transpose(dy, (1, 2, 0, 3)).reshape(oh, ow, 1, b * c)
    out = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32),
        rhs.astype(jnp.float32),
        window_strides=(1, 1),
        padding=padding,
        rhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(kh, kw, b, c).sum(axis=2, keepdims=False)[:, :, None, :]


def dk_patch(x, dy, kh, kw, stride, padding):
    """dK via conv_general_dilated_patches + dot_general."""
    b, h, w, c = x.shape
    oh, ow = dy.shape[1], dy.shape[2]
    patches = jax.lax.conv_general_dilated_patches(
        x.astype(jnp.float32),
        filter_shape=(kh, kw),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, oh, ow, C*kh*kw]
    patches = patches.reshape(b, oh, ow, c, kh, kw)
    dk = jnp.einsum("bhwckl,bhwc->klc", patches, dy.astype(jnp.float32))
    return dk[:, :, None, :]


CANDIDATES = {
    "slice": dk_slice,
    "gconv": dk_gconv,
    "patch": dk_patch,
}


def main():
    rng = np.random.RandomState(0)
    mesh = make_mesh(8, axes=("data", "space"))
    repl = NamedSharding(mesh, P())

    shardings = {
        "data": P("data"),
        "both-batch": P(("data", "space")),
        "data+chan": P("data", None, None, "space"),
        "data+spatial": P("data", "space"),
    }

    for (h, w, c, k, s) in [(24, 40, 16, 3, 1), (24, 40, 16, 5, 2),
                            (16, 32, 8, 5, 1)]:
        x64 = rng.randn(4, h, w, c)
        k64 = rng.randn(k, k, 1, c)
        dy64 = None
        x = jnp.asarray(x64.astype(np.float32))
        kern = jnp.asarray(k64.astype(np.float32))
        ph = _same_pad(h, k, s)
        pw = _same_pad(w, k, s)
        pad = (ph, pw)

        def loss(kernel, xx):
            y = _dw_raw(xx, kernel, s, pad)
            return jnp.sum(y * jnp.cos(y))

        dy = jax.grad(lambda y: jnp.sum(y * jnp.cos(y)))(
            _dw_raw(x, kern, s, pad)
        )
        # f64 ground truth via the direct correlation formula
        xp64 = np.pad(x64, ((0, 0), ph, pw, (0, 0)))
        dy64 = np.asarray(dy, np.float64)
        oh, ow = dy.shape[1], dy.shape[2]
        dk_true = np.zeros((k, k, 1, c))
        for i in range(k):
            for j in range(k):
                patch = xp64[:, i:i + (oh - 1) * s + 1:s,
                             j:j + (ow - 1) * s + 1:s, :]
                dk_true[i, j, 0] = np.sum(patch * dy64, axis=(0, 1, 2))
        nrm = np.linalg.norm(dk_true)

        print(f"== {h}x{w} c{c} k{k} s{s} ==")
        # raw autodiff on the mesh under every sharding combo — hunting the
        # round-2 bug signature (dK scaled by the space axis / garbage)
        for nm, spec in shardings.items():
            sh = NamedSharding(mesh, spec)
            try:
                dk_mesh = jax.jit(
                    jax.grad(loss), in_shardings=(repl, sh),
                    out_shardings=repl,
                )(jax.device_put(kern, repl), jax.device_put(x, sh))
                rel = float(np.linalg.norm(np.asarray(dk_mesh, np.float64)
                                           - dk_true) / nrm)
                flag = "**BUG**" if rel > 1e-3 else "ok"
                print(f"  raw-autodiff x@{nm:12s} rel={rel:.3e} {flag}")
            except Exception as e:
                print(f"  raw-autodiff x@{nm:12s} ERROR {type(e).__name__}: {e}")

        for name, fn in CANDIDATES.items():
            dk = fn(x, dy, k, k, s, pad)
            rel1 = float(np.linalg.norm(np.asarray(dk, np.float64) - dk_true)
                         / nrm)
            line = f"  {name:6s} single={rel1:.3e}"
            for nm in ("data", "data+chan"):
                sh = NamedSharding(mesh, shardings[nm])
                dk_m = jax.jit(
                    fn, static_argnums=(2, 3, 4, 5),
                    in_shardings=(sh, sh), out_shardings=repl,
                )(jax.device_put(x, sh), jax.device_put(dy, sh), k, k, s, pad)
                rel2 = float(np.linalg.norm(np.asarray(dk_m, np.float64)
                                            - dk_true) / nrm)
                line += f" mesh[{nm}]={rel2:.3e}"
            print(line)


if __name__ == "__main__":
    main()
