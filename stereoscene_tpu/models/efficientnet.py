"""EfficientNet image backbone (b0-b8) in flax.linen, channels-last.

Capability rebuild of the reference ``CustomEfficientNet``
(ref: projects/mmdet3d_plugin/occupancy/backbones/efficientnet.py:274-534):
compound width/depth scaling over the base 'b' layer table, TF-SAME adaptive
padding, BN(eps 1e-3) + Swish, squeeze-excite with ratio
``expand_ratio * se_ratio`` on the expanded width, stochastic depth linearly
increasing to ``drop_path_rate``, and multi-stage feature outputs selected by
``out_indices``.

For the active config (arch='b7', out_indices=(2,3,4,5,6),
stereoscene.py:59-69) the stage channel widths are [48, 80, 224, 640, 2560]
at strides 1/4, 1/8, 1/16, 1/32, 1/32 — verified by unit test against the
reference's own scaling rules.

Activation checkpointing (`with_cp`, ref :105-108) maps to `jax.checkpoint`
(flax nn.remat) around each block.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, DropPath, EffSELayer

# Base (b0) layer table. Per block:
# (kernel, out_channels, se_ratio, stride, expand_ratio)
# Stage boundaries below follow the reference's merge rule: a stage starts at
# a stride-2 block (or at the first block group).
# ref: efficientnet.py:308-327 layer_settings['b']
_BASE_BLOCKS = [
    # (kernel, out_ch, se_ratio, stride, expand)
    [(3, 16, 4, 1, 1)],
    [(3, 24, 4, 2, 6), (3, 24, 4, 1, 6)],
    [(5, 40, 4, 2, 6), (5, 40, 4, 1, 6)],
    [(3, 80, 4, 2, 6), (3, 80, 4, 1, 6), (3, 80, 4, 1, 6),
     (5, 112, 4, 1, 6), (5, 112, 4, 1, 6), (5, 112, 4, 1, 6)],
    [(5, 192, 4, 2, 6), (5, 192, 4, 1, 6), (5, 192, 4, 1, 6),
     (5, 192, 4, 1, 6), (3, 320, 4, 1, 6)],
]
_STEM = (3, 32, 2)  # kernel, channels, stride
_HEAD = (1, 1280, 1)

# EfficientNet-EdgeTPU ('e') table (ref: efficientnet.py:328-347
# layer_settings['e']): se_ratio 0 (no SE). The 6th element is the
# reference's block_type: 1 = EdgeResidual (3x3 24/32/48 stages only),
# 0 = InvertedResidual (the 5x5 96/144/192 stages).
_BASE_BLOCKS_E = [
    [(3, 24, 0, 1, 3, 1)],
    [(3, 32, 0, 2, 8, 1), (3, 32, 0, 1, 8, 1)],
    [(3, 48, 0, 2, 8, 1), (3, 48, 0, 1, 8, 1), (3, 48, 0, 1, 8, 1),
     (3, 48, 0, 1, 8, 1)],
    [(5, 96, 0, 2, 8, 0), (5, 96, 0, 1, 8, 0), (5, 96, 0, 1, 8, 0),
     (5, 96, 0, 1, 8, 0), (5, 96, 0, 1, 8, 0),
     (5, 144, 0, 1, 8, 0), (5, 144, 0, 1, 8, 0), (5, 144, 0, 1, 8, 0),
     (5, 144, 0, 1, 8, 0)],
    [(5, 192, 0, 2, 8, 0), (5, 192, 0, 1, 8, 0)],
]

# (width_mult, depth_mult) per arch. ref: efficientnet.py:354-367
ARCH_SETTINGS = {
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
    "b5": (1.6, 2.2),
    "b6": (1.8, 2.6),
    "b7": (2.0, 3.1),
    "b8": (2.2, 3.6),
    "es": (1.0, 1.0),
    "em": (1.0, 1.1),
    "el": (1.2, 1.4),
}


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round channel count to the nearest multiple of ``divisor`` without
    dropping below 90% (the standard EfficientNet rule)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def scaled_stage_settings(arch: str):
    """Apply compound scaling and regroup blocks into stages.

    Width: every block's out_channels scaled by w and rounded to /8.
    Depth: blocks are segmented by (scaled) out_channels; each segment's
    count becomes ceil(d * count), repeating the segment's last block.
    Stages: a segment whose first block has stride 1 merges into the
    previous stage. (ref: efficientnet.py:231-271 model_scaling)

    Returns (stem_channels, stages, head_channels) where stages is a list of
    lists of (kernel, out_ch, se_ratio, stride, expand) for the 'b' family,
    or (kernel, out_ch, se_ratio, stride, expand, kind, with_residual)
    7-tuples for the EdgeTPU 'e' family (es/em/el), where kind is 'edge'
    (block_type 1: the 3x3 24/32/48 stages) or 'mb' (block_type 0: the 5x5
    96/144/192 stages build InvertedResidual, ref: efficientnet.py:328-347,
    473-490). Depth-scaled copies of the expand-3 edge block switch to
    expand 4 without residual (ref: efficientnet.py:474-478).
    """
    w, d = ARCH_SETTINGS[arch]
    is_edge = arch[0] == "e"
    table = _BASE_BLOCKS_E if is_edge else _BASE_BLOCKS
    # flatten blocks, scale width
    segments = []  # list of lists, split by out_channels
    for group in table:
        current = []
        for blk in group:
            k, c, se, s, e = blk[:5]
            bt = blk[5] if len(blk) > 5 else 0
            c = make_divisible(c * w, 8)
            if current and current[-1][1] != c:
                segments.append(current)
                current = []
            current.append((k, c, se, s, e, bt))
        segments.append(current)

    # scale depth per segment
    scaled_segments = []
    for seg in segments:
        n = int(math.ceil(d * len(seg)))
        blocks = list(seg[:n]) if n <= len(seg) else list(seg) + [seg[-1]] * (
            n - len(seg)
        )
        scaled_segments.append(blocks)

    # merge into stages: stride-1-leading segments join the previous stage
    stages = []
    for i, seg in enumerate(scaled_segments):
        if i > 0 and seg[0][3] == 1:
            stages[-1] = stages[-1] + seg
        else:
            stages.append(list(seg))

    if is_edge:
        # 7-tuples carrying the block kind; depth-scaled extra copies of the
        # expand-3 edge block become expand-4 non-residual (ref :474-478)
        stages = [
            [
                (k, c, se, s,
                 4 if (bt == 1 and j > 0 and e == 3) else e,
                 "edge" if bt == 1 else "mb",
                 not (bt == 1 and j > 0 and e == 3))
                for j, (k, c, se, s, e, bt) in enumerate(stage)
            ]
            for stage in stages
        ]
    else:
        stages = [[blk[:5] for blk in stage] for stage in stages]

    stem_channels = make_divisible(_STEM[1] * w, 8)
    head_channels = int(_HEAD[1] * w)
    return stem_channels, stages, head_channels


def _same_pad(size: int, kernel: int, stride: int):
    out = -(-size // stride)
    pad = max((out - 1) * stride + kernel - size, 0)
    return pad // 2, pad - pad // 2


def depthwise_conv_shifted(x, kernel, stride: int):
    """Depthwise conv as K^2 shifted multiply-accumulates (TF-SAME).

    XLA's grouped-conv lowering of depthwise kernels runs the MXU at group
    size 1 and measures ~100x below peak on this chip; expressing the op as
    explicit shifts + VPU FMAs fuses into a single fast loop nest.

    Args:
      x: [B, H, W, C]; kernel: [kh, kw, 1, C].
    """
    kh, kw = kernel.shape[:2]
    b, h, w, c = x.shape
    ph = _same_pad(h, kh, stride)
    pw = _same_pad(w, kw, stride)
    xp = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    out_h = -(-h // stride)
    out_w = -(-w // stride)
    acc = None
    for i in range(kh):
        for j in range(kw):
            patch = xp[
                :,
                i : i + (out_h - 1) * stride + 1 : stride,
                j : j + (out_w - 1) * stride + 1 : stride,
                :,
            ]
            term = patch * kernel[i, j, 0]
            acc = term if acc is None else acc + term
    return acc


def _dw_raw(x, kernel, stride, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def _use_safe_depthwise_vjp(requested: "bool | None") -> bool:
    """Whether to route depthwise convs through the GSPMD-safe custom VJP.

    The XLA grouped-conv kernel-gradient bug this guards against only
    manifests on *multi-axis* meshes with partially replicated operands —
    single-device and single-axis data-parallel gradients are correct
    through the standard path (modulo the conv-transpose lowering's reduced
    f32 accuracy, ~2e-3 relative, measured in tools/probe_dwgrad.py; the
    safe backward is exact to ~5e-7). Callers that know a spatial mesh axis
    is active pass ``requested=True`` (BEVDepthOccupancy does when a
    voxel_constraint is set); ``requested=None`` falls back to the
    >1-devices heuristic. STEREOSCENE_DW_SAFE_VJP=0/1 overrides everything.

    History: the round-2 K^2 strided-slice backward faulted the TPU worker
    inside the full detector backward; the current grouped-conv dK
    formulation (see ``_dw_bwd``) runs clean on the chip (round 3,
    bench_train with DW_SAFE_VJP=1: 422 ms/step, no fault).
    """
    mode = os.environ.get("STEREOSCENE_DW_SAFE_VJP", "auto")
    if mode == "1":
        return True
    if mode == "0":
        return False
    if requested is not None:
        return requested
    return jax.device_count() > 1


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_conv2d(x, kernel, stride, padding):
    """Depthwise conv (NHWC, kernel [kh, kw, 1, C]) with a GSPMD-safe VJP.

    XLA's SPMD partitioner mis-reduces the *kernel* gradient of
    feature-grouped convolutions when operands are partially replicated on a
    multi-axis mesh (observed on a ('data', 'space') mesh: dK scaled exactly
    by the size of the unused 'space' axis for stride-1 kernels, garbage for
    strided 5x5 ones; the data gradient and all other ops are fine). The
    forward keeps XLA's fast grouped-conv lowering; the backward computes dK
    with K^2 shifted elementwise multiply-reduces, whose partitioning rules
    are exact.
    """
    return _dw_raw(x, kernel, stride, padding)


def _dw_fwd(x, kernel, stride, padding):
    return _dw_raw(x, kernel, stride, padding), (x, kernel)


def _dw_bwd(stride, padding, res, dy):
    x, kernel = res
    _, vjp_x = jax.vjp(lambda t: _dw_raw(t, kernel, stride, padding), x)
    (dx,) = vjp_x(dy)
    kh, kw = kernel.shape[:2]
    b, h, w, c = x.shape
    oh, ow = dy.shape[1], dy.shape[2]
    # dK as a *forward-style* feature-grouped conv with dy as the kernel
    # (batch folded into the groups):
    #   dK[i,j,c] = sum_{b,oh,ow} xpad[b, i+oh*s, j+ow*s, c] * dy[b,oh,ow,c]
    # i.e. correlate x with dy at dilation=stride. This op class partitions
    # correctly under GSPMD (it's the same primitive signature as every
    # forward depthwise in the net), is exact in f32 with HIGHEST precision
    # (XLA's auto-transposed batch-grouped conv loses ~2e-3 relative), and
    # avoids the K^2 strided-slice backward that faulted the TPU worker
    # inside the full detector backward (probed in tools/probe_dwgrad.py).
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
    dk = out.reshape(kh, kw, b, c).sum(axis=2)[:, :, None, :]
    return dx, dk.astype(kernel.dtype)


depthwise_conv2d.defvjp(_dw_fwd, _dw_bwd)


class DepthwiseConv2dSame(nn.Module):
    """Drop-in for ``nn.Conv(C, k, feature_group_count=C, padding='SAME',
    use_bias=False)``: identical param tree ('kernel' [kh, kw, 1, C], same
    default init) so checkpoint converters are unaffected, but with the
    GSPMD-safe VJP above."""

    kernel_size: int
    stride: int = 1
    safe_vjp: Optional[bool] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, c)
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=None)
        ph = _same_pad(x.shape[1], k, self.stride)
        pw = _same_pad(x.shape[2], k, self.stride)
        if _use_safe_depthwise_vjp(self.safe_vjp):
            return depthwise_conv2d(x, kernel, self.stride, (ph, pw))
        return _dw_raw(x, kernel, self.stride, (ph, pw))


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True
    safe_vjp: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: the explicit K^2 shift-FMA depthwise (depthwise_conv_shifted)
        # measured 2x SLOWER than XLA's grouped-conv lowering on v5e (25x
        # HBM reads don't fuse); keep XLA's lowering.
        if self.groups > 1:
            assert self.groups == x.shape[-1] == self.features, (
                "only full depthwise grouping is used in this backbone"
            )
            x = DepthwiseConv2dSame(
                kernel_size=self.kernel, stride=self.stride,
                safe_vjp=self.safe_vjp, name="conv"
            )(x)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                strides=(self.stride, self.stride),
                padding="SAME",  # TF-adaptive padding (Conv2dAdaptivePadding)
                use_bias=False,
                name="conv",
            )(x)
        x = BatchNorm(epsilon=1e-3, name="bn")(x, train=train)
        if self.act:
            x = nn.swish(x)
        return x


class InvertedResidual(nn.Module):
    """MBConv block (ref: efficientnet.py:112-229)."""

    out_channels: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: int
    drop_path_rate: float = 0.0
    safe_vjp: "bool | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid = in_channels * self.expand_ratio
        residual = x

        out = x
        if mid != in_channels:
            out = ConvBNAct(mid, 1, name="expand_conv")(out, train=train)
        out = ConvBNAct(
            mid, self.kernel, stride=self.stride, groups=mid,
            safe_vjp=self.safe_vjp, name="depthwise_conv"
        )(out, train=train)
        if self.se_ratio > 0:
            squeeze = int(mid // (self.expand_ratio * self.se_ratio))
            out = EffSELayer(mid, max(1, squeeze), name="se")(out)
        out = ConvBNAct(self.out_channels, 1, act=False, name="linear_conv")(
            out, train=train
        )

        if self.stride == 1 and in_channels == self.out_channels:
            out = DropPath(self.drop_path_rate, name="drop_path")(
                out, deterministic=not train
            )
            out = residual + out
        return out


class EdgeResidual(nn.Module):
    """EdgeTPU block (ref: efficientnet.py:15-111): full-kernel expand conv
    at stride 1, optional SE, 1x1 *strided* projection, residual when
    stride 1 and matching width."""

    out_channels: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: int
    with_residual: bool = True
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        mid = cin * self.expand_ratio
        out = ConvBNAct(mid, self.kernel, name="conv1")(x, train=train)
        if self.se_ratio > 0:
            squeeze = max(1, int(mid // (self.expand_ratio * self.se_ratio)))
            out = EffSELayer(mid, squeeze, name="se")(out)
        out = ConvBNAct(
            self.out_channels, 1, stride=self.stride, act=False, name="conv2"
        )(out, train=train)
        if self.with_residual and self.stride == 1 \
                and cin == self.out_channels:
            out = DropPath(self.drop_path_rate, name="drop_path")(
                out, deterministic=not train
            )
            out = x + out
        return out


class CustomEfficientNet(nn.Module):
    """Multi-output EfficientNet.

    Attributes mirror the reference config keys (stereoscene.py:59-69):
      arch, drop_path_rate, out_indices, with_cp, frozen_stages. Freezing is
      implemented at the optimizer level: pass
      ``engine.train.efficientnet_frozen_predicate(frozen_stages)`` to
      ``create_train_state`` (optax.multi_transform zeroes those updates);
      tools/train.py wires this from the config automatically.
    Stage indexing matches the reference: 0 = stem conv, 1..5 = block stages,
    6 = head conv.
    """

    arch: str = "b0"
    out_indices: Tuple[int, ...] = (6,)
    drop_path_rate: float = 0.0
    with_cp: bool = False
    frozen_stages: int = 0
    # GSPMD-safe depthwise VJP request (see _use_safe_depthwise_vjp):
    # None = auto heuristic; the detector passes True when a spatial mesh
    # axis is active and False otherwise
    safe_depthwise_vjp: "bool | None" = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        stem_ch, stages, head_ch = scaled_stage_settings(self.arch)
        total_blocks = sum(len(s) for s in stages)
        dprs = [
            self.drop_path_rate * i / max(total_blocks - 1, 1)
            for i in range(total_blocks)
        ]

        outs = []
        x = ConvBNAct(stem_ch, _STEM[0], stride=_STEM[2], name="stem")(
            x, train=train
        )
        if 0 in self.out_indices:
            outs.append(x)

        block_idx = 0
        max_needed = max(self.out_indices)
        for stage_idx, stage in enumerate(stages, start=1):
            if stage_idx > max_needed:
                break
            for j, blk in enumerate(stage):
                if len(blk) == 5:
                    k, c, se, s, e = blk
                    block_cls = InvertedResidual
                    extra = {"safe_vjp": self.safe_depthwise_vjp}
                else:  # EdgeTPU-family 7-tuple: edge OR mb per block_type
                    k, c, se, s, e, kind, resid = blk
                    if kind == "edge":
                        block_cls = EdgeResidual
                        extra = {"with_residual": resid}
                    else:
                        block_cls = InvertedResidual
                        extra = {"safe_vjp": self.safe_depthwise_vjp}
                if self.with_cp:
                    block_cls = nn.remat(block_cls, static_argnums=(2,))
                x = block_cls(
                    out_channels=c,
                    kernel=k,
                    stride=s,
                    expand_ratio=e,
                    se_ratio=se,
                    drop_path_rate=dprs[block_idx],
                    name=f"stage{stage_idx}_block{j}",
                    **extra,
                )(x, train)
                block_idx += 1
            if stage_idx in self.out_indices:
                outs.append(x)

        n_stages = len(stages)
        if n_stages + 1 in self.out_indices:
            x = ConvBNAct(head_ch, _HEAD[0], stride=_HEAD[2], name="head")(
                x, train=train
            )
            outs.append(x)
        return tuple(outs)
