"""Common building blocks with torch-equivalent semantics, channels-last.

These wrap flax.linen so that every parameterized op has a well-defined
correspondence to the reference's torch modules (needed by the torch->JAX
checkpoint converter in utils/checkpoint_convert.py):

- ``Conv`` / ``Conv3d``: explicit symmetric integer padding (torch style) or
  'SAME' (TF-style adaptive padding used by the EfficientNet stem,
  ref: efficientnet.py:374 ``Conv2dAdaptivePadding``).
- ``ConvTransposeTorch``: exact torch ConvTranspose semantics
  (output = (i-1)s - 2p + k + op) via lhs-dilated convolution with a
  spatially flipped kernel.
- ``GroupNorm`` / ``BatchNorm``: flax modules with torch eps/momentum
  conventions (torch momentum m == flax momentum 1-m).
- ``SELayer``: the BEVDepth camera-aware squeeze-excite
  (ref: ViewTransformerLSSBEVDepth.py:442-454) — both 1x1 convs keep full
  channel width and the gate multiplies the *feature* map by the gated
  *camera embedding* path.
- ``Mlp``: two linear layers + ReLU (ref: ViewTransformerLSSBEVDepth.py:417-439).
- ``DropPath``: per-sample stochastic depth (ref: efficientnet.py drop_path).
"""

from __future__ import annotations

import os

from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def agg4d_enabled(batch: int, train: bool, with_cp: bool = False) -> bool:
    """Static gate for the slice-packed rank-4 aggregation domain (agg4d).

    True only for B=1 inference without remat; ``STEREOSCENE_AGG4D``
    overrides: "1" forces on (shape conditions still apply), "0" forces
    off, "auto" (default) additionally requires a single device — GSPMD
    propagation through the rank-4 chain on a sharded mesh is unvalidated.
    """
    if train or batch != 1 or with_cp:
        return False
    gate = os.environ.get("STEREOSCENE_AGG4D", "auto")
    if gate == "0":
        return False
    return gate == "1" or (gate == "auto" and jax.device_count() == 1)


def _plain_conv3d(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3, padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def _zpack_s1_core(x, w):
    """Stride-1 zpack lowering body (see _ZPackConv3d)."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    # [kd,kh,kw,ci,co] -> [kh,kw,ci, kd*co] (out-channel block g = kd)
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 3 * co)
    z = jax.lax.conv_general_dilated(
        x.reshape(b * d, h, wd, ci), w2,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    ).reshape(b, d, h, wd, 3, co)
    zp = jnp.pad(z, ((0, 0), (1, 1)) + ((0, 0),) * 4)
    # cross-correlation: y[d] = sum_kd z[d + kd - 1, g=kd]
    return (zp[:, 0:d, ..., 0, :] + zp[:, 1:d + 1, ..., 1, :]
            + zp[:, 2:d + 2, ..., 2, :])


def _zpack_s2_core(x, w):
    """Stride-2 depth-parity zpack lowering body (see _ZPackConv3dS2)."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    do, ho, wo = d // 2, h // 2, wd // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    xe = xp[:, 0::2]
    xo = xp[:, 1::2]
    w_even = jnp.concatenate([w[0], w[2]], axis=-1)
    w_odd = w[1]

    def conv2d_s2(inp, ww):
        n = inp.shape[0] * inp.shape[1]
        z = jax.lax.conv_general_dilated(
            inp.reshape(n, h, wd, ci), ww,
            window_strides=(2, 2), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        return z.reshape(inp.shape[0], inp.shape[1], ho, wo, -1)

    ze = conv2d_s2(xe, w_even)
    zo = conv2d_s2(xo, w_odd)
    return (ze[:, :do, ..., :co] + zo[:, :do] + ze[:, 1:do + 1, ..., co:])


def _dpack_s1_core(x, w):
    """Stride-1 dpack lowering body (see _DPackConv3d): the 3 depth taps are
    folded into *input* channels (one conv2d 3*Ci -> Co per depth slice)."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1)) + ((0, 0),) * 3)
    # xcat[:, d0, ..., kd-block] = xp[:, d0 + kd] = x[:, d0 + kd - 1]
    xcat = jnp.concatenate(
        [xp[:, 0:d], xp[:, 1:d + 1], xp[:, 2:d + 2]], axis=-1
    )
    # [kd,kh,kw,ci,co] -> [kh,kw,(kd ci),co]: kd major matches the concat
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * d, h, wd, 3 * ci), w2,
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y.reshape(b, d, h, wd, co)


def _dpack_s2_core(x, w):
    """Stride-2 dpack lowering body: y[do] = sum_kd W[kd] *2d,s2 xp[2*do+kd],
    so the depth-strided shifts concat into input channels and one
    stride-2 conv2d does all the MACs."""
    b, d, h, wd, ci = x.shape
    co = w.shape[-1]
    do = d // 2
    xp = jnp.pad(x, ((0, 0), (1, 1)) + ((0, 0),) * 3)
    xcat = jnp.concatenate(
        [xp[:, 0:d:2], xp[:, 1:d + 1:2], xp[:, 2:d + 2:2]], axis=-1
    )
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)
    y = jax.lax.conv_general_dilated(
        xcat.reshape(b * do, h, wd, 3 * ci), w2,
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return y.reshape(b, do, h // 2, wd // 2, co)


def _make_zpack_op(core, stride):
    """custom_vjp wrapper: zpack forward, plain-conv3d backward.

    Two XLA:TPU miscompiles force this structure (round-3 on-chip bisect):
    the zpack *autodiff* backward (conv2d dK over a B*D batch fused with
    the pad/slice depth-shift grads) NaNs when chained with a GroupNorm —
    even in full f32 — and a mathematically-identical plain-conv3d VJP
    *also* NaNs whenever it shares one program with the zpack forward
    (separate programs are finite). The ``optimization_barrier`` between
    the residuals/cotangent and the backward convs blocks the bad fusion;
    the backward additionally accumulates in f32 (a bf16
    preferred_element_type dW over ~1M-term sums is rounding garbage).
    Same fix family as the depthwise dK reformulation (efficientnet.py)."""

    @jax.custom_vjp
    def op(x, w):
        # barrier the output as well: without it the zpack forward block
        # fuses into surrounding *backward* ops (e.g. GroupNorm's) and the
        # same NaN miscompile returns even with a correct custom bwd.
        # STEREOSCENE_ZPACK_BARRIER=0 drops the barriers — MEASUREMENT ONLY
        # (tools/probe_zpack_cost.py decomposes the round-4 506 ms/step):
        # the graph is then exposed to the round-3 NaN miscompile on chip.
        if os.environ.get("STEREOSCENE_ZPACK_BARRIER", "1") == "0":
            return core(x, w)
        return jax.lax.optimization_barrier(core(x, w))

    def fwd(x, w):
        return op(x, w), (x, w)

    def bwd(res, g):
        x, w = res
        if os.environ.get("STEREOSCENE_ZPACK_BARRIER", "1") != "0":
            x, w, g = jax.lax.optimization_barrier((x, w, g))
        # f32 island: the transposed convs then run/accumulate in f32 and
        # the grads round back to the param dtype at the converts (a bf16
        # preferred_element_type dW over ~1M-term sums is rounding garbage).
        # STEREOSCENE_ZPACK_BWD_F32=0 keeps the operand dtype — MEASUREMENT
        # ONLY, isolates the island's cost share.
        bdt = (jnp.float32
               if os.environ.get("STEREOSCENE_ZPACK_BWD_F32", "1") != "0"
               else x.dtype)
        # STEREOSCENE_ZPACK_BWD=core (default, round 5): autodiff VJP of the
        # zpack lowering itself (2D convs over the B*D batch) — same math as
        # the plain-conv3d VJP (tests/test_zpack.py core-bwd test), 120 ms/
        # step faster at flagship B=1 (381.9 vs 501.6, 15.7% vs 11.9% MFU)
        # because the conv3d VJP materializes 4x-padded 5D temporaries (it
        # OOMs outright with zpack off). The round-3 NaN bisect only tested
        # the core VJP *without* barriers; behind the barriers it ran a
        # 100-step on-chip burn-in clean (BURNIN_r05.json, PERF.md round-5
        # decomposition). =conv3d restores the round-4 backward.
        body = (core
                if os.environ.get("STEREOSCENE_ZPACK_BWD", "core")
                == "core"
                else lambda xx, ww: jax.lax.conv_general_dilated(
                    xx, ww, window_strides=(stride,) * 3,
                    padding=[(1, 1)] * 3,
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                ))

        def conv_b(xx, ww):
            return body(xx.astype(bdt), ww.astype(bdt))

        _, vjp = jax.vjp(conv_b, x, w)
        return vjp(g.astype(bdt))

    op.defvjp(fwd, bwd)
    return op


_zpack_s1 = _make_zpack_op(_zpack_s1_core, 1)
_zpack_s2 = _make_zpack_op(_zpack_s2_core, 2)
_dpack_s1 = _make_zpack_op(_dpack_s1_core, 1)
_dpack_s2 = _make_zpack_op(_dpack_s2_core, 2)


# ---------------------------------------------------------------------------
# Slice-packed rank-4 domain ("agg4d"): the whole-chain answer to the
# round-3 lowering studies. Per-op zpack/dpack/dphase each won standalone
# but LOST in-graph because every op re-entered XLA's 5D conv3d layout at
# its boundary (PERF.md round-3 hourglass study). Here the B=1 inference
# volume lives as a rank-4 [D, H, W, C] tensor — depth is the conv2d batch
# dim — through the ENTIRE cost-aggregation chain (dres stem, all three
# hourglasses, classif heads, MIE convs), so no 5D conv operand ever
# exists and the relayouts have nothing to attach to. Depth taps become
# pad/slice/add on the leading dim (s1: zpack out-channel fold or dpack
# in-channel fold; s2: depth-parity; deconv: depth-phase) — the exact same
# tap algebra as the 5D lowerings above, minus the 5D round-trips.
# ---------------------------------------------------------------------------


def _conv2d(x, w, stride=1, padding=1, lhs_dilation=None, pad2=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=pad2 if pad2 is not None else [(padding, padding)] * 2,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _slice4d_conv_s1_zpack(x, w):
    """[D,H,W,Ci] x [3,3,3,Ci,Co] -> [D,H,W,Co]; taps -> output channels."""
    d, h, wd, ci = x.shape
    co = w.shape[-1]
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 3 * co)
    z = _conv2d(x, w2)
    zp = jnp.pad(z, ((1, 1), (0, 0), (0, 0), (0, 0)))
    return (zp[0:d, ..., 0:co] + zp[1:d + 1, ..., co:2 * co]
            + zp[2:d + 2, ..., 2 * co:])


def _slice4d_conv_s1_dpack(x, w):
    """[D,H,W,Ci] x [3,3,3,Ci,Co] -> [D,H,W,Co]; taps -> input channels."""
    d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate([xp[0:d], xp[1:d + 1], xp[2:d + 2]], axis=-1)
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)
    return _conv2d(xcat, w2)


def _slice4d_conv_s2_dpack(x, w):
    """Stride-2 (all three dims): y[do] = sum_kd W[kd] *2d,s2 xp[2do+kd]."""
    d, h, wd, ci = x.shape
    co = w.shape[-1]
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0), (0, 0)))
    xcat = jnp.concatenate(
        [xp[0:d:2], xp[1:d + 1:2], xp[2:d + 2:2]], axis=-1
    )
    w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * ci, co)
    return _conv2d(xcat, w2, stride=2)


def _slice4d_deconv_k3s2_subpixel(x, kernel, dtype):
    """torch ConvTranspose3d(k3, s2, p1, op1) on [D,H,W,Ci] — subpixel form.

    The lhs-dilated lowering (_slice4d_deconv_k3s2) stencils 9 H/W taps over
    an input that is 3/4 zeros: 2x the useful MACs at 3*Co output lanes.
    Here every output phase gets its own (zero-padded) 2x2 sub-kernel and
    ALL 12 (3 depth taps x 4 HW phases) land in the output channels of ONE
    stride-1 conv2d over the small input — 2.25x fewer MACs, 12*Co lanes —
    followed by the depth shift-add and a pure phase-interleave reshape.
    In the 5D domain this lost to the depth-to-space relayout (PERF.md
    round-2 subpixel study); in the rank-4 agg4d domain the interleave is
    the only relayout left and it fuses with the consumer.

    Tap algebra (per dim, torch o = 2i + k - 1): even output 2m <- k=1 @ m;
    odd 2m+1 <- k=2 @ m  +  k=0 @ m+1 (zero past the edge, op=1 semantics).
    """
    d, h, wd, ci = x.shape
    co = kernel.shape[-1]
    w = kernel.astype(dtype)  # [kd, kh, kw, ci, co]
    zh = jnp.zeros_like(w[:, :1])
    # H phases -> new axis a in {0,1} = input row offset
    wh = jnp.stack(
        [
            jnp.concatenate([w[:, 1:2], zh], axis=1),           # ph = 0
            jnp.concatenate([w[:, 2:3], w[:, 0:1]], axis=1),    # ph = 1
        ],
        axis=0,
    )  # [ph, kd, a, kw, ci, co]
    zw = jnp.zeros_like(wh[:, :, :, :1])
    wf = jnp.stack(
        [
            jnp.concatenate([wh[:, :, :, 1:2], zw], axis=3),    # pw = 0
            jnp.concatenate(
                [wh[:, :, :, 2:3], wh[:, :, :, 0:1]], axis=3
            ),                                                  # pw = 1
        ],
        axis=0,
    )  # [pw, ph, kd, a, b, ci, co]
    wf = jnp.transpose(wf, (3, 4, 5, 2, 1, 0, 6)).reshape(
        2, 2, ci, 12 * co
    )  # [a, b, ci, (kd, ph, pw, co)]
    z = _conv2d(x.astype(dtype), wf, padding=0, pad2=[(0, 1), (0, 1)])
    z = z.reshape(d, h, wd, 3, 2, 2, co)
    even = z[:, :, :, 1]
    zp = jnp.pad(z, ((0, 1),) + ((0, 0),) * 6)
    odd = zp[0:d, :, :, 2] + zp[1:d + 1, :, :, 0]
    y = jnp.stack([even, odd], axis=1)            # [d, pd, h, wd, ph, pw, co]
    y = jnp.transpose(y, (0, 1, 2, 4, 3, 5, 6))   # [d, pd, h, ph, wd, pw, co]
    return y.reshape(2 * d, 2 * h, 2 * wd, co)


def _slice4d_deconv_keqs(x, kernel, s, dtype):
    """torch ConvTranspose3d(k=s, stride=s, p=0) on [D,H,W,Ci]: y[s*i+r] =
    W[r] @ x[i] per phase triple r — one 1x1 conv2d to s^3*Co lanes, then a
    pure phase interleave (fuses with the consumer in the rank-4 domain)."""
    d, h, wd, ci = x.shape
    co = kernel.shape[-1]
    if s == 1:
        return _conv2d(
            x.astype(dtype), kernel.astype(dtype).reshape(1, 1, ci, co),
            padding=0,
        )
    # [kd,kh,kw,ci,co] -> [1,1,ci,(kd kh kw co)]
    w2 = jnp.transpose(kernel.astype(dtype), (3, 0, 1, 2, 4)).reshape(
        1, 1, ci, s * s * s * co
    )
    z = _conv2d(x.astype(dtype), w2, padding=0)
    z = z.reshape(d, h, wd, s, s, s, co)
    z = jnp.transpose(z, (0, 3, 1, 4, 2, 5, 6))
    return z.reshape(s * d, s * h, s * wd, co)


def _slice4d_deconv_k3s2(x, kernel, dtype):
    """torch ConvTranspose3d(k3, s2, p1, op1) on [D,H,W,Ci] (depth-phase;
    same algebra as _dphase_deconv_k3s2 without the 5D round-trip)."""
    d, h, wd, ci = x.shape
    co = kernel.shape[-1]
    w2 = jnp.transpose(kernel.astype(dtype), (1, 2, 3, 0, 4)).reshape(
        3, 3, ci, 3 * co
    )
    w2f = w2[::-1, ::-1]
    z = _conv2d(
        x.astype(dtype), w2f, lhs_dilation=(2, 2), pad2=[(1, 2), (1, 2)]
    )  # [D, 2H, 2W, 3co]
    even = z[..., co:2 * co]  # depth tap kd=1
    zp = jnp.pad(z, ((0, 1), (0, 0), (0, 0), (0, 0)))
    odd = zp[0:d, ..., 2 * co:] + zp[1:d + 1, ..., 0:co]
    out = jnp.stack([even, odd], axis=1)  # [D, 2, 2H, 2W, co]
    return out.reshape(2 * d, 2 * h, 2 * wd, co)


class _SlicePackConv3d(nn.Module):
    """3x3x3 / 1x1x1 conv3d on a slice-packed rank-4 [D, H, W, C] tensor.

    Declares the identical param tree as nn.Conv (name='Conv_0', 'kernel'
    [kd,kh,kw,Ci,Co]) so checkpoints and the torch converter are unaffected.
    Packing for s1 3x3x3: 'z' (taps->out channels) when 3*Co fits the gate,
    else 'd' (taps->in channels); override: STEREOSCENE_AGG4D_PACK=z|d.
    """

    features: int
    kernel_size: tuple = (3, 3, 3)
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        ci = x.shape[-1]
        # lecun_normal matches the 5D paths (nn.Conv default, _ZPackConv3d,
        # _DPackConv3d) so initializing a model with agg4d active draws the
        # same weight distribution as the 5D graph (advisor round-4 finding)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*k, ci, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        w = kernel.astype(dtype)
        x = x.astype(dtype)
        if k == (1, 1, 1):
            y = _conv2d(
                x, w.reshape(1, 1, ci, self.features),
                stride=self.stride, padding=0,
            )
            if self.stride == 2:  # stride also applies along depth
                y = y[::2]
        elif self.stride == 1:
            pack = os.environ.get("STEREOSCENE_AGG4D_PACK", "auto")
            if pack == "auto":
                pack = "z" if 3 * self.features <= 128 else "d"
            y = (_slice4d_conv_s1_zpack if pack == "z"
                 else _slice4d_conv_s1_dpack)(x, w)
        else:
            y = _slice4d_conv_s2_dpack(x, w)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class _DPackConv3d(nn.Module):
    """Exact 3x3x3 conv3d lowered as conv2d with the depth taps folded into
    *input* channels (the complement of _ZPackConv3d for convs whose output
    channels already fill the MXU lanes).

    For the hourglass interior convs (64/128 out channels) the zpack trick
    would overflow the 128 output lanes; here the kd taps instead triple the
    contraction depth (3*Ci = 192/384), which is what the MXU wants. The
    depth-shifted concat costs one extra materialization of 3x the input —
    HBM-cheap next to the MACs at these shapes. Exact tap algebra; parameter
    tree matches nn.Conv ('kernel' [3,3,3,Ci,Co], 'bias'). Backward uses the
    plain-conv3d VJP in an f32 island behind optimization_barriers (shared
    custom_vjp wrapper with zpack — see _make_zpack_op).
    """

    features: int
    stride: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, ci, co)
        )
        dtype = self.dtype or x.dtype
        op = _dpack_s1 if self.stride == 1 else _dpack_s2
        y = op(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (co,))
            y = y + bias.astype(dtype)
        return y


class _ZPackConv3d(nn.Module):
    """Exact 3x3x3 stride-1 conv3d lowered as conv2d with the depth taps
    folded into output channels, plus a shift-add over depth.

    Motivation (measured on v5e, tools/probe_conv3d.py): XLA's conv3d with
    C_out<=32 runs at ~1-14 TF/s because the output channels occupy only a
    fraction of the 128 MXU lanes. Computing z[e, kd] = W2d[kd] *2d x[e]
    (one conv2d C_in -> 3*C_out over each depth slice) then
    y[d] = sum_kd z[d + kd - 1, kd] is mathematically identical
    (cross-correlation tap algebra) and triples lane occupancy at zero extra
    FLOPs: 2.7x for 32->32, 3.4x for 2->32, 6x for 32->1.

    Parameter names/shapes match nn.Conv ('kernel' [3,3,3,Ci,Co], 'bias')
    so checkpoint converters are unaffected.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, 3, ci, co),
        )
        dtype = self.dtype or x.dtype
        y = _zpack_s1(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (co,))
            y = y + bias.astype(dtype)
        return y


class _ZPackConv3dS2(nn.Module):
    """Exact 3x3x3 stride-2 conv3d via depth-parity phase split.

    y[do] = sum_kd conv2d_s2(xpad[2*do + kd], W[kd]); the padded depth index
    2*do+kd has parity kd%2, so even slices feed taps {0,2} (one conv2d with
    2*Co output channels) and odd slices feed tap 1 — zero wasted MACs,
    identical tap algebra, and 2-3x the MXU lane occupancy of XLA's direct
    conv3d at Co<=64 (probe_conv3d.py measured strided conv3d at the same
    sub-peak rates as stride-1).

    Parameter tree matches nn.Conv ('kernel' [3,3,3,Ci,Co], 'bias').
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, ci, co)
        )
        dtype = self.dtype or x.dtype
        d, h, wd = x.shape[1:4]
        assert d % 2 == 0 and h % 2 == 0 and wd % 2 == 0, (d, h, wd)
        y = _zpack_s2(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (co,))
            y = y + bias.astype(dtype)
        return y


class _PallasConv3d(nn.Module):
    """3x3x3 stride-1 conv3d via the Pallas im2col kernel
    (ops/pallas_conv3d.py) — used for the hourglass interior convs whose
    channel counts (64/128) fit neither the zpack trick (output lanes
    overflow) nor XLA's conv3d tiling. Param tree matches nn.Conv."""

    features: int
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv3d import conv3d_s1_pallas

        ci = x.shape[-1]
        co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, 3, ci, co)
        )
        dtype = self.dtype or x.dtype
        y = conv3d_s1_pallas(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (co,))
            y = y + bias.astype(dtype)
        return y


def _pallas_conv3d_enabled():
    """Opt-in gate (STEREOSCENE_PALLAS_CONV3D=1): the Pallas im2col conv3d
    wins isolated microbenches but measured *slower in-graph* than XLA's
    conv3d at the hourglass shapes (chained probe: +1.6 ms/hourglass —
    the op-boundary relayouts eat the MXU win; see PERF.md round 3), so
    the default stays XLA. Mosaic kernels only lower on TPU."""
    if os.environ.get("STEREOSCENE_PALLAS_CONV3D", "0") != "1":
        return False
    dd = jax.config.jax_default_device
    on_cpu = (jax.default_backend() == "cpu"
              or (dd is not None and dd.platform == "cpu"))
    return not on_cpu


class ConvNd(nn.Module):
    """Torch-style convolution: integer padding means symmetric zero pad.

    Weight param name 'kernel' with shape [*k, Cin/groups, Cout]."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    ndim: int = 2
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int], str] = 0
    groups: int = 1
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        k = _tuple(self.kernel_size, self.ndim)
        s = _tuple(self.stride, self.ndim)
        if self.ndim == 3 and x.ndim == 4:
            # slice-packed rank-4 input ([D, H, W, C], B=1 inference): the
            # whole-chain agg4d domain. Identical param tree via Conv_0.
            assert self.groups == 1 and not isinstance(self.padding, str)
            assert k in ((3, 3, 3), (1, 1, 1)) and s[0] == s[1] == s[2]
            assert _tuple(self.padding, 3) == ((1,) * 3 if k[0] == 3
                                               else (0,) * 3)
            return _SlicePackConv3d(
                features=self.features, kernel_size=k, stride=s[0],
                use_bias=self.use_bias, dtype=self.dtype, name="Conv_0",
            )(x)
        if (
            self.ndim == 3
            and k == (3, 3, 3)
            and s == (2, 2, 2)
            and self.groups == 1
            and not isinstance(self.padding, str)
            and _tuple(self.padding, 3) == (1, 1, 1)
            and all(dim % 2 == 0 for dim in x.shape[1:4])
            and os.environ.get("STEREOSCENE_ZPACK_S2", "0") == "1"
        ):
            # depth-parity phase lowering for strided 3x3x3 convs (the
            # hourglass encoder path); exact math, identical param tree
            return _ZPackConv3dS2(
                features=self.features, use_bias=self.use_bias,
                dtype=self.dtype, name="Conv_0",
            )(x)
        if (
            self.ndim == 3
            and k == (3, 3, 3)
            and s == (1, 1, 1)
            and self.groups == 1
            and not isinstance(self.padding, str)
            and _tuple(self.padding, 3) == (1, 1, 1)
            # 64-ch convs win standalone (probe_conv3d 64->64 s1
            # 2.12 -> 1.36 ms) but a widened <=192 gate measured neutral
            # end-to-end (9.9 vs 10.0 fps, within run noise) — keep <=128
            # by default; STEREOSCENE_ZPACK_MAX overrides for experiments
            and 3 * self.features
            <= int(os.environ.get("STEREOSCENE_ZPACK_MAX", "128"))
        ):
            # MXU-lane-packing lowering for small-channel 3x3x3 convs;
            # exact math, identical param tree (see _ZPackConv3d).
            return _ZPackConv3d(
                features=self.features, use_bias=self.use_bias,
                dtype=self.dtype, name="Conv_0",
            )(x)
        if (
            self.ndim == 3
            and k == (3, 3, 3)
            and s == (1, 1, 1)
            and self.groups == 1
            and not isinstance(self.padding, str)
            and _tuple(self.padding, 3) == (1, 1, 1)
            and x.shape[-1] in (64, 128)
            and self.features >= 64
            and _pallas_conv3d_enabled()
        ):
            # Pallas im2col kernel for the fat hourglass interior convs
            # (channels pad to the 128-lane tile, so gate to Ci 64/128
            # where the pad waste is <= 2x; Ci=32 stays on zpack)
            return _PallasConv3d(
                features=self.features, use_bias=self.use_bias,
                dtype=self.dtype, name="Conv_0",
            )(x)
        if (
            self.ndim == 3
            and k == (3, 3, 3)
            and s in ((1, 1, 1), (2, 2, 2))
            and self.groups == 1
            and not isinstance(self.padding, str)
            and _tuple(self.padding, 3) == (1, 1, 1)
            and (s == (1, 1, 1)
                 or all(dim % 2 == 0 for dim in x.shape[1:4]))
            and os.environ.get("STEREOSCENE_DPACK", "0") == "1"
        ):
            # input-side depth fold for fat-output 3x3x3 convs (the
            # hourglass 64/128-channel interior); exact math, identical
            # param tree (see _DPackConv3d). Reaches here only when the
            # zpack gates above don't claim the conv.
            return _DPackConv3d(
                features=self.features, stride=s[0],
                use_bias=self.use_bias, dtype=self.dtype, name="Conv_0",
            )(x)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            p = _tuple(self.padding, self.ndim)
            pad = [(pi, pi) for pi in p]
        return nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=s,
            padding=pad,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


def Conv2d(features, kernel_size, stride=1, padding=0, groups=1, use_bias=True,
           dtype=None, name=None):
    return ConvNd(features=features, kernel_size=kernel_size, ndim=2,
                  stride=stride, padding=padding, groups=groups,
                  use_bias=use_bias, dtype=dtype, name=name)


def Conv3d(features, kernel_size, stride=1, padding=0, groups=1, use_bias=True,
           dtype=None, name=None):
    return ConvNd(features=features, kernel_size=kernel_size, ndim=3,
                  stride=stride, padding=padding, groups=groups,
                  use_bias=use_bias, dtype=dtype, name=name)


def _dphase_deconv_k3s2(x, kernel, dtype):
    """torch ConvTranspose3d(k=3, s=2, p=1, op=1) via depth-phase
    decomposition; see ConvTransposeTorch for the derivation. kernel is
    torch-layout [3, 3, 3, Ci, Co] (unflipped)."""
    b, d, h, wd, ci = x.shape
    co = kernel.shape[-1]
    w = kernel.astype(dtype)
    x = x.astype(dtype)
    # [kd,kh,kw,ci,co] -> one 2D kernel [kh,kw,ci, kd*co]
    w2 = jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(3, 3, ci, 3 * co)
    w2f = w2[::-1, ::-1]
    z = jax.lax.conv_general_dilated(
        x.reshape(b * d, h, wd, ci), w2f,
        window_strides=(1, 1), padding=[(1, 2), (1, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, d, 2 * h, 2 * wd, 3, co)
    even = z[:, :, :, :, 1, :]
    zp = jnp.pad(z, ((0, 0), (0, 1)) + ((0, 0),) * 4)
    odd = zp[:, 0:d, :, :, 2, :] + zp[:, 1:d + 1, :, :, 0, :]
    out = jnp.stack([even, odd], axis=2)
    return out.reshape(b, 2 * d, 2 * h, 2 * wd, co)


class ConvTransposeTorch(nn.Module):
    """Transposed convolution with exact torch output semantics.

    out_size = (in - 1) * stride - 2 * padding + kernel + output_padding
    Implemented as an lhs-dilated convolution with a spatially flipped
    kernel, which is the algebraic definition of torch's ConvTranspose.
    Used by the 3D hourglass decoders (ref: ViewTransformerLSSVoxel.py:81-86)
    and SECONDFPN upsampling (ref: necks/second_fpn_3d.py:49-72).
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    ndim: int = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        k = _tuple(self.kernel_size, self.ndim)
        s = _tuple(self.stride, self.ndim)
        p = _tuple(self.padding, self.ndim)
        op = _tuple(self.output_padding, self.ndim)
        in_features = x.shape[-1]

        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (*k, in_features, self.features),
            jnp.float32,
        )
        dim_chars = "DHW"[-self.ndim:]
        spec = (f"N{dim_chars}C", f"{dim_chars}IO", f"N{dim_chars}C")
        dtype = self.dtype or x.dtype

        if self.ndim == 3 and x.ndim == 4:
            # slice-packed rank-4 input (agg4d domain)
            if k == s and p == (0, 0, 0) and op == (0, 0, 0):
                # kernel == stride (the FPN3D deblocks): non-overlapping —
                # each input voxel expands to an s^3 block, so the whole op
                # is ONE 1x1 conv2d to s^3*Co lanes + a phase interleave
                # (torch o = i*s + k - p with p=0 maps tap k to phase k
                # directly; no kernel flip).
                y = _slice4d_deconv_keqs(x, kernel, s[0], dtype)
            else:
                assert k == (3, 3, 3) and s == (2, 2, 2) and p == (1, 1, 1) \
                    and op == (1, 1, 1), (k, s, p, op)
                if os.environ.get("STEREOSCENE_AGG4D_SUBPIXEL", "0") == "1":
                    y = _slice4d_deconv_k3s2_subpixel(x, kernel, dtype)
                else:
                    y = _slice4d_deconv_k3s2(x, kernel, dtype)
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    jnp.float32,
                )
                y = y + bias.astype(y.dtype)
            return y

        # Subpixel phase-decomposition is exact and wins per-op in isolation
        # (probe_deconv.py), but in the full graph the depth-to-space
        # relayouts break XLA fusion and cost more than the dilated conv's
        # wasted MACs (stage_view 89 ms -> 110 ms measured). Default off;
        # kept behind the flag for future libtpu/Mosaic revisits.
        use_subpixel = os.environ.get(
            "STEREOSCENE_SUBPIXEL_DECONV", "0"
        ) == "1"
        if use_subpixel and all(ki == 3 for ki in k) \
                and all(si == 2 for si in s) \
                and all(pi == 1 for pi in p) and all(oi == 1 for oi in op):
            y = _subpixel_deconv_k3s2(x, kernel, self.ndim, spec, dtype)
        elif self.ndim == 3 and k == (3, 3, 3) and s == (2, 2, 2) \
                and p == (1, 1, 1) and op == (1, 1, 1) \
                and os.environ.get("STEREOSCENE_DPHASE_DECONV", "0") == "1":
            # Depth-phase decomposition with the 3 depth taps folded into
            # output channels of ONE 2D transposed conv (3x MXU lane
            # occupancy). Exact: out[2m] = w[1]*T2d x[m];
            #        out[2m+1] = w[2]*T2d x[m] + w[0]*T2d x[m+1].
            # Measured (tools/probe_deconv3d.py, v5e): wins standalone
            # (64->32 1.13 -> 0.46 ms) but LOSES in the full graph
            # (view stage 69.7 -> 74.7 ms; same relayout story as the
            # subpixel path) — default off, kept for future libtpu revisits.
            y = _dphase_deconv_k3s2(x, kernel, dtype)
        else:
            spatial_axes = tuple(range(self.ndim))
            flipped = jnp.flip(kernel, axis=spatial_axes)
            pad = [
                (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i])
                for i in range(self.ndim)
            ]
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                flipped.astype(dtype),
                window_strides=(1,) * self.ndim,
                padding=pad,
                lhs_dilation=s,
                dimension_numbers=spec,
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


def _subpixel_deconv_k3s2(x, kernel, ndim, spec, dtype):
    """Exact subpixel lowering of ConvTranspose(kernel 3, stride 2, padding 1,
    output_padding 1) — the hourglass decoder shape (ref
    ViewTransformerLSSVoxel.py:81-86).

    XLA lowers a transposed conv as an lhs-dilated conv: a 3^n-tap stencil
    over an input that is 1/2^n zeros, wasting ~2^n of the MACs and leaving
    the MXU's 128 output lanes 4x under-filled at the hourglass's 32-64
    channels. The same linear map, decomposed by output phase r (o = 2q + r):

        y[2q + r] = sum_m x[q + delta_r - m] * W[2m + c_r]

    is one dense 2^n-window convolution producing all 2^n phases as extra
    output channels, interleaved back with a depth-to-space reshape. Per-dim
    tap table (k=3, s=2, p=1): phase 0 reads x[q]*W[1]; phase 1 reads
    x[q+1]*W[0] + x[q]*W[2]. FLOPs drop ~3.4x and output channels fill the
    MXU. Bit-identical to the dilated-conv lowering (same params, same math;
    guarded by the torch-parity tests in tests/test_models.py and
    tests/test_hourglass_parity.py).
    """
    cin, cout = kernel.shape[-2], kernel.shape[-1]
    # per-dim: taps[r][w] = kernel index used by phase r at window offset w
    # (w indexes x[q + w]); None = structural zero.
    taps = {0: {0: 1, 1: None}, 1: {0: 2, 1: 0}}

    import itertools

    phases = list(itertools.product((0, 1), repeat=ndim))
    blocks = []
    zero = jnp.zeros((cin, cout), kernel.dtype)
    for r in phases:
        w_kernel = []
        for w in itertools.product((0, 1), repeat=ndim):
            kk = tuple(taps[r[d]][w[d]] for d in range(ndim))
            w_kernel.append(zero if None in kk else kernel[kk])
        # [2]*ndim window, [cin, cout]
        blocks.append(
            jnp.stack(w_kernel, axis=0).reshape((2,) * ndim + (cin, cout))
        )
    # [2..., cin, 2^ndim * cout], phase-major output blocks
    w_aug = jnp.concatenate(blocks, axis=-1)

    pad = [(0, 1)] * ndim  # window w=1 reads x[q+1]; zero past the edge
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        w_aug.astype(dtype),
        window_strides=(1,) * ndim,
        padding=pad,
        dimension_numbers=spec,
    )
    # depth-to-space: [B, *in, 2^ndim * cout] -> [B, *(2*in), cout]
    b = y.shape[0]
    in_sp = y.shape[1:-1]
    y = y.reshape((b,) + in_sp + (2,) * ndim + (cout,))
    # interleave: [b, q_0, .., q_{n-1}, r_0, .., r_{n-1}, c]
    #          -> [b, q_0, r_0, .., q_{n-1}, r_{n-1}, c]
    perm = [0]
    for d in range(ndim):
        perm += [1 + d, 1 + ndim + d]
    perm += [1 + 2 * ndim]
    y = y.transpose(perm)
    return y.reshape((b,) + tuple(2 * sdim for sdim in in_sp) + (cout,))


class GroupNorm(nn.Module):
    """GroupNorm with torch defaults (eps 1e-5, affine).

    Default: full fp32 compute (the reference's force_fp32 islands). With
    STEREOSCENE_GN_COMPUTE=bf16 the elementwise normalize/affine stays in
    the activation dtype while flax still reduces the statistics in fp32 —
    halves HBM traffic on the big 3D volumes when XLA can't fuse the casts.

    ``packed3d``: the module normalizes a 3D grid that may arrive in the
    slice-packed rank-4 [D, H, W, C] layout (agg4d domain, B=1) — the
    statistics must span the depth slices too, so the grid is flattened to
    one flax batch sample for the reduction (identical params/numerics to
    the 5D layout; same trick as ConvGN3d). Without the flag a rank-4 input
    is a batched 2D map [B, H, W, C] and dim 0 is a true batch axis.
    """

    num_groups: int
    packed3d: bool = False

    @nn.compact
    def __call__(self, x):
        shape3d = None
        if self.packed3d and x.ndim == 4:
            shape3d = x.shape
            d, h, w, c = shape3d
            x = x.reshape(1, d * h, w, c)
        orig_dtype = x.dtype
        if _NORM_KEEP_DTYPE:
            y = nn.GroupNorm(
                num_groups=self.num_groups, epsilon=1e-5, dtype=orig_dtype
            )(x)
        else:
            y = nn.GroupNorm(
                num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32
            )(x.astype(jnp.float32)).astype(orig_dtype)
        if shape3d is not None:
            y = y.reshape(shape3d)
        return y


import os

# Performance escape hatch: by default BatchNorm computes in fp32 (matching
# the reference's force_fp32 islands). In inference BN is an affine map, so
# bf16 is numerically safe; set STEREOSCENE_BN_COMPUTE=bf16 to keep the
# activation dtype through BN (saves 2x HBM traffic when XLA can't fuse the
# converts into the conv epilogue).
_BN_KEEP_DTYPE = os.environ.get("STEREOSCENE_BN_COMPUTE", "fp32") == "bf16"
_NORM_KEEP_DTYPE = os.environ.get("STEREOSCENE_GN_COMPUTE", "fp32") == "bf16"


class BatchNorm(nn.Module):
    """BatchNorm with torch momentum convention (torch m -> flax 1-m)."""

    epsilon: float = 1e-5
    torch_momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        orig_dtype = x.dtype
        if _BN_KEEP_DTYPE and not train:
            return nn.BatchNorm(
                use_running_average=True,
                momentum=1.0 - self.torch_momentum,
                epsilon=self.epsilon,
                dtype=orig_dtype,
            )(x)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.torch_momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class Mlp(nn.Module):
    """Linear -> act -> Linear (ref: ViewTransformerLSSBEVDepth.py:417-439).
    Dropout rates are 0 in every reference instantiation."""

    hidden_features: int
    out_features: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_features, name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(self.out_features, name="fc2")(x)
        return x


class SELayer(nn.Module):
    """Camera-aware SE: gate feature map x by a transformed embedding x_se.

    ref: ViewTransformerLSSBEVDepth.py:442-454. Both convs are 1x1 at full
    width; ``x_se`` enters as [B, C] (broadcast over space).
    """

    channels: int
    act: Callable = nn.relu
    gate: Callable = nn.sigmoid

    @nn.compact
    def __call__(self, x, x_se):
        # x: [B, H, W, C]; x_se: [B, C]
        se = nn.Dense(self.channels, name="conv_reduce")(x_se)
        se = self.act(se)
        se = nn.Dense(self.channels, name="conv_expand")(se)
        gate = self.gate(se)
        return x * gate[:, None, None, :].astype(x.dtype)


class EffSELayer(nn.Module):
    """EfficientNet-style self squeeze-excite: global pool -> reduce ->
    expand -> sigmoid gate (ref: efficientnet.py se_cfg usage; mmdet SELayer
    with ratio = expand_ratio * se_ratio, divisor removed)."""

    channels: int
    squeeze_channels: int
    act: Callable = nn.swish

    @nn.compact
    def __call__(self, x):
        # x: [B, H, W, C]
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        se = nn.Dense(self.squeeze_channels, name="conv1")(pooled.astype(x.dtype))
        se = self.act(se)
        se = nn.Dense(self.channels, name="conv2")(se)
        return x * nn.sigmoid(se)[:, None, None, :].astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class ConvGNReLU(nn.Module):
    """Conv -> GroupNorm -> ReLU, the stereofeature/DepthNet reduce pattern
    (ref: ViewTransformerLSSVoxel.py:38-47 with GN num_groups=2)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    num_groups: int = 2
    ndim: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvNd(
            features=self.features, kernel_size=self.kernel_size, ndim=self.ndim,
            stride=self.stride, padding=self.padding, name="conv",
        )(x)
        x = GroupNorm(num_groups=self.num_groups, name="gn")(x)
        return nn.relu(x)


class ConvGN3d(nn.Module):
    """conv3d (no bias) + GroupNorm — the ``convbn_3d`` unit of the stereo
    cost aggregation (ref: ViewTransformerLSSVoxel.py:66-69, GN groups=2)."""

    features: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 1
    num_groups: int = 2

    @nn.compact
    def __call__(self, x):
        x = ConvNd(
            features=self.features, kernel_size=self.kernel_size, ndim=3,
            stride=self.stride, padding=self.padding, use_bias=False,
            name="conv",
        )(x)
        if x.ndim == 4:
            # slice-packed [D, H, W, C] (agg4d, B=1): GN statistics must
            # span the depth slices too — flatten to one flax batch sample
            # [1, D*H, W, C] for the reduction, identical params/numerics
            d, h, w, c = x.shape
            y = GroupNorm(num_groups=self.num_groups, name="gn")(
                x.reshape(1, d * h, w, c)
            )
            return y.reshape(d, h, w, c)
        return GroupNorm(num_groups=self.num_groups, name="gn")(x)
