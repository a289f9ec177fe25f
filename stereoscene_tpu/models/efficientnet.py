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
from typing import Sequence, Tuple

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
    lists of (kernel, out_ch, se_ratio, stride, expand).
    """
    w, d = ARCH_SETTINGS[arch]
    # flatten blocks, scale width
    segments = []  # list of lists, split by out_channels
    for group in _BASE_BLOCKS:
        current = []
        for (k, c, se, s, e) in group:
            c = make_divisible(c * w, 8)
            if current and current[-1][1] != c:
                segments.append(current)
                current = []
            current.append((k, c, se, s, e))
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


class ConvBNAct(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        # NOTE: the explicit K^2 shift-FMA depthwise (depthwise_conv_shifted)
        # measured 2x SLOWER than XLA's grouped-conv lowering on v5e (25x
        # HBM reads don't fuse); keep XLA's lowering.
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",  # TF-adaptive padding (Conv2dAdaptivePadding)
            feature_group_count=self.groups,
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        mid = in_channels * self.expand_ratio
        residual = x

        out = x
        if mid != in_channels:
            out = ConvBNAct(mid, 1, name="expand_conv")(out, train=train)
        out = ConvBNAct(
            mid, self.kernel, stride=self.stride, groups=mid, name="depthwise_conv"
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
            for j, (k, c, se, s, e) in enumerate(stage):
                block_cls = InvertedResidual
                if self.with_cp:
                    block_cls = nn.remat(InvertedResidual, static_argnums=(2,))
                x = block_cls(
                    out_channels=c,
                    kernel=k,
                    stride=s,
                    expand_ratio=e,
                    se_ratio=se,
                    drop_path_rate=dprs[block_idx],
                    name=f"stage{stage_idx}_block{j}",
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
