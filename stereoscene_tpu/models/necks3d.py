"""Alternate 3D necks: FPN3D and SpconvNeck3D, channels-last.

Rebuilds of the reference's inactive neck variants:

- ``FPN3D`` (ref: occupancy/necks/fpn3d.py:13-126): per-level 1x1x1 lateral
  convs to a common width, *top-down* additive fusion (coarse level
  trilinearly upsampled onto the finer one, align_corners=False), 3x3x3
  fpn convs per level, and optionally ``num_upsample`` extra stride-2
  deconv blocks prepended on the finest level.
- ``SpconvNeck3D`` (ref: occupancy/necks/spconv_neck.py:13-107): same
  lateral/fpn conv structure but fused *fine-to-coarse* (laterals[i-1]
  interpolated down onto laterals[i]). Dense convs replace spconv — at the
  128^3-and-below grids used here dense conv3d is the right TPU mapping
  (see voxel_encoder.py rationale).

Both take a list of [B, X, Y, Z, C_i] grids and return a list of
[B, X_i, Y_i, Z_i, C_out] maps.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import resize_trilinear
from .layers import Conv3d, ConvTransposeTorch, GroupNorm


class ConvGNReLU3d(nn.Module):
    """mmcv ConvModule(conv3d bias=False, GN, ReLU) equivalent."""

    features: int
    kernel: int = 3
    padding: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.features, self.kernel, padding=self.padding,
                   use_bias=False, name="conv")(x)
        y = GroupNorm(num_groups=self.norm_groups, name="gn")(y)
        return nn.relu(y)


class FPN3D(nn.Module):
    """Top-down 3D feature pyramid (ref: fpn3d.py:13-126)."""

    in_channels: Sequence[int]
    out_channels: int = 256
    num_upsample: int = 0
    norm_groups: int = 32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        n = len(feats)
        laterals = [
            ConvGNReLU3d(self.out_channels, kernel=1, padding=0,
                         norm_groups=self.norm_groups,
                         name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down: coarse -> fine additive fusion (ref :103-107)
        for i in range(n - 1, 0, -1):
            up = resize_trilinear(laterals[i], laterals[i - 1].shape[1:4])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            ConvGNReLU3d(self.out_channels, norm_groups=self.norm_groups,
                         name=f"fpn{i}")(laterals[i])
            for i in range(n)
        ]
        # extra deconv levels prepended on the finest map (ref :117-123)
        up = outs[0]
        for i in range(self.num_upsample):
            up = ConvTransposeTorch(
                features=self.out_channels, kernel_size=2, ndim=3, stride=2,
                use_bias=False, name=f"upsample{i}_deconv")(up)
            up = GroupNorm(num_groups=self.norm_groups,
                           name=f"upsample{i}_gn")(up)
            up = nn.relu(up)
            outs.insert(0, up)
        return outs


class SpconvNeck3D(nn.Module):
    """Fine-to-coarse fused 3D pyramid (ref: spconv_neck.py:13-107)."""

    in_channels: Sequence[int]
    out_channels: int = 256
    norm_groups: int = 32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        n = len(feats)
        laterals = [
            ConvGNReLU3d(self.out_channels, kernel=1, padding=0,
                         norm_groups=self.norm_groups,
                         name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # fine -> coarse: downsample the finer map onto each level (ref :98-101)
        for i in range(1, n):
            down = resize_trilinear(laterals[i - 1], laterals[i].shape[1:4])
            laterals[i] = laterals[i] + down
        return [
            ConvGNReLU3d(self.out_channels, norm_groups=self.norm_groups,
                         name=f"fpn{i}")(laterals[i])
            for i in range(n)
        ]
