"""Voxel middle encoders: dense TPU equivalents of the spconv alternates.

The reference's ``CustomSparseEncoder`` / ``CustomSparseUNet``
(ref: occupancy/voxel_encoder/sparse_encoder.py, sparse_unet.py — spconv
CUDA) voxelize LiDAR points and run sparse 3D convolutions. On TPU the
128x128x16 grid is small enough that dense 3D convolutions are faster than
any gather-based sparsity at realistic occupancy (>1%), so the equivalents
here are dense encoders over the same scatter-voxelized inputs; the
point->voxel scatter reuses ops.voxel_pool.

``DenseSparseEncoder``: conv stem + 3 down stages + out conv (SECOND-style
middle encoder). ``DenseUNet3D``: symmetric encoder/decoder with skip
connections (the sparse-UNet equivalent).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxel_pool import voxel_pool_scatter
from .layers import Conv3d, ConvTransposeTorch, GroupNorm


def voxelize_points(
    points: jnp.ndarray,
    features: jnp.ndarray,
    valid: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    pc_range: Sequence[float],
) -> jnp.ndarray:
    """Mean-pool point features into a dense voxel grid (the Voxelization +
    HardSimpleVFE equivalent, ref ViewTransformerSpconv.py:16).

    Args:
      points: [P, 3] ego xyz; features: [P, C]; valid: [P] bool.
    Returns: [X, Y, Z, C] mean features.
    """
    nx, ny, nz = grid_shape
    lo = jnp.asarray(pc_range[:3], jnp.float32)
    hi = jnp.asarray(pc_range[3:], jnp.float32)
    size = (hi - lo) / jnp.asarray(grid_shape, jnp.float32)
    coords = jnp.floor((points - lo) / size).astype(jnp.int32)
    in_bounds = jnp.all(
        (coords >= 0) & (coords < jnp.asarray(grid_shape)), axis=-1
    )
    ok = valid & in_bounds
    ranks = jnp.where(
        ok,
        coords[:, 0] * (ny * nz) + coords[:, 1] * nz + coords[:, 2],
        nx * ny * nz,
    )
    summed = voxel_pool_scatter(features, ranks, nx * ny * nz)
    counts = voxel_pool_scatter(
        jnp.ones((features.shape[0], 1), features.dtype), ranks,
        nx * ny * nz,
    )
    mean = summed / jnp.maximum(counts, 1.0)
    return mean.reshape(nx, ny, nz, -1)


class ConvGNBlock(nn.Module):
    features: int
    stride: int = 1
    norm_groups: int = 16

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.features, 3, stride=self.stride, padding=1,
                   use_bias=False, name="conv")(x)
        x = GroupNorm(self.norm_groups, name="gn")(x)
        return nn.relu(x)


class DenseSparseEncoder(nn.Module):
    """SECOND-style middle encoder (CustomSparseEncoder equivalent)."""

    base_channels: int = 16
    encoder_channels: Sequence[int] = (16, 32, 64, 128)
    out_channels: int = 128
    norm_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvGNBlock(self.base_channels, norm_groups=self.norm_groups,
                        name="stem")(x)
        for i, ch in enumerate(self.encoder_channels):
            stride = 1 if i == 0 else 2
            x = ConvGNBlock(ch, stride=stride,
                            norm_groups=self.norm_groups, name=f"down{i}")(x)
            x = ConvGNBlock(ch, norm_groups=self.norm_groups,
                            name=f"res{i}")(x)
        return ConvGNBlock(self.out_channels, norm_groups=self.norm_groups,
                           name="out")(x)


class DenseUNet3D(nn.Module):
    """Symmetric 3D UNet (CustomSparseUNet equivalent)."""

    channels: Sequence[int] = (16, 32, 64)
    norm_groups: int = 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        for i, ch in enumerate(self.channels):
            x = ConvGNBlock(ch, stride=1 if i == 0 else 2,
                            norm_groups=self.norm_groups, name=f"enc{i}")(x)
            skips.append(x)
        for i in reversed(range(len(self.channels) - 1)):
            x = ConvTransposeTorch(
                features=self.channels[i], kernel_size=2, ndim=3, stride=2,
                use_bias=False, name=f"up{i}",
            )(x)
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = ConvGNBlock(self.channels[i],
                            norm_groups=self.norm_groups, name=f"dec{i}")(x)
        return x
