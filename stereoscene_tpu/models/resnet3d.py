"""3D ResNet voxel backbone over [B, X, Y, Z, C] grids.

Rebuild of ``CustomResNet3D`` (ref: occupancy/backbones/resnet3d.py:106-246):
1x1x1 input projection, then ``num_stage`` residual stages with strides
[1, 2, 2, ...] and GroupNorm(32) (the active config, stereoscene.py:55,87-95).
Supports depths 10/18/34 (BasicBlock) and 50/101 (Bottleneck).

The optional CRP3D context-relation-prior module (ref :158-165, inactive in
the scored config) hooks in after ``crp_level`` via the ``crp3d`` flag; its
module lives in models/crp3d.py.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen as nn

from .layers import Conv3d, GroupNorm

_LAYER_COUNTS = {10: [1, 1, 1, 1], 18: [2, 2, 2, 2], 34: [3, 4, 6, 3],
                 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}


class BasicBlock3d(nn.Module):
    features: int
    stride: int = 1
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = Conv3d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv1")(x)
        y = GroupNorm(self.norm_groups, packed3d=True, name="gn1")(y)
        y = nn.relu(y)
        y = Conv3d(self.features, 3, padding=1, use_bias=False, name="conv2")(y)
        y = GroupNorm(self.norm_groups, packed3d=True, name="gn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv3d(self.features, 1, stride=self.stride,
                              use_bias=False, name="downsample_conv")(x)
            residual = GroupNorm(self.norm_groups, packed3d=True, name="downsample_gn")(
                residual
            )
        return nn.relu(y + residual)


class Bottleneck3d(nn.Module):
    features: int
    stride: int = 1
    norm_groups: int = 32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_features = self.features * self.expansion
        residual = x
        y = Conv3d(self.features, 1, use_bias=False, name="conv1")(x)
        y = nn.relu(GroupNorm(self.norm_groups, packed3d=True, name="gn1")(y))
        y = Conv3d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv2")(y)
        y = nn.relu(GroupNorm(self.norm_groups, packed3d=True, name="gn2")(y))
        y = Conv3d(out_features, 1, use_bias=False, name="conv3")(y)
        y = GroupNorm(self.norm_groups, packed3d=True, name="gn3")(y)
        if self.stride != 1 or x.shape[-1] != out_features:
            residual = Conv3d(out_features, 1, stride=self.stride,
                              use_bias=False, name="downsample_conv")(x)
            residual = GroupNorm(self.norm_groups, packed3d=True, name="downsample_gn")(
                residual
            )
        return nn.relu(y + residual)


class CustomResNet3D(nn.Module):
    depth: int = 18
    num_stage: int = 3
    block_inplanes: Sequence[int] = (128, 256, 512)
    block_strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2)
    norm_groups: int = 32
    # optional context-relation prior (ref resnet3d.py:158-165, inactive in
    # the scored config); relation logits are returned for the BCE loss
    crp3d: bool = False
    crp_level: int = 2
    crp_mega_shape: Tuple[int, int, int] = (32, 32, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        block = BasicBlock3d if self.depth in (10, 18, 34) else Bottleneck3d
        counts = _LAYER_COUNTS[self.depth]

        y = Conv3d(self.block_inplanes[0], 1, use_bias=False,
                   name="input_proj_conv")(x)
        y = GroupNorm(self.norm_groups, packed3d=True, name="input_proj_gn")(y)
        y = nn.relu(y)

        outs = []
        crp_logits = None
        for stage in range(self.num_stage):
            for i in range(counts[stage]):
                y = block(
                    features=self.block_inplanes[stage],
                    stride=self.block_strides[stage] if i == 0 else 1,
                    norm_groups=self.norm_groups,
                    name=f"layer{stage}_block{i}",
                )(y)
            if self.crp3d and stage == self.crp_level:
                from .crp3d import CPMegaVoxels

                y, crp_logits = CPMegaVoxels(
                    channels=self.block_inplanes[stage],
                    mega_shape=self.crp_mega_shape,
                    norm_groups=self.norm_groups,
                    name="cp_mega_voxels",
                )(y)
            if stage in self.out_indices:
                outs.append(y)
        if self.crp3d:
            return outs, crp_logits
        return outs
