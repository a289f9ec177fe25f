"""SharedOccHead: one MLP decodes both voxels and query points.

Rebuild of the reference ``SharedOccHead``
(ref: occupancy/dense_heads/shared_occhead.py:22-252): the finest voxel
grid is flattened to per-cell feature vectors, query points sample the same
grid trilinearly, and a single shared MLP
(Linear -> Softplus -> Linear -> Linear, ref :58-64) maps both to class
logits. Optional image-feature injection adds 1x1-reduced camera features
at the points' projected pixels (ref :115-131).

TPU layout: voxels stay [B, X, Y, Z, C]; the MLP is applied directly on the
channels-last grid (no flatten/transpose needed — a Dense over the last axis
IS the reference's per-cell linear), and points are decoded by the same
bound submodules.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .occhead import bilinear_image_sample, trilinear_point_sample


class SharedMlp(nn.Module):
    """Linear -> Softplus -> Linear -> Linear (ref :58-64)."""

    hidden: int
    out_channel: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc0")(x)
        x = nn.softplus(x)
        x = nn.Dense(self.hidden, name="fc1")(x)
        return nn.Dense(self.out_channel, name="fc2")(x)


class SharedOccHead(nn.Module):
    in_channels: int
    out_channel: int
    hidden_dims: int = 128
    sampling_img_feats: bool = False
    in_img_channels: int = 640
    point_cloud_range: Sequence[float] = (0.0, -25.6, -2.0, 51.2, 25.6, 4.4)

    @nn.compact
    def __call__(
        self,
        voxel_feats: List[jnp.ndarray],
        points: Optional[jnp.ndarray] = None,
        img_feats: Optional[jnp.ndarray] = None,
        points_uv: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        grid = voxel_feats[-1]  # [B, X, Y, Z, C]
        mlp = SharedMlp(self.hidden_dims, self.out_channel, name="shared_mlp")

        output_voxels = mlp(grid)  # per-cell decode == flattened linear

        output_points = None
        if points is not None:
            lo = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
            hi = jnp.asarray(self.point_cloud_range[3:], jnp.float32)
            norm = (points[..., :3].astype(jnp.float32) - lo) / (hi - lo)
            norm = norm * 2.0 - 1.0  # [-1, 1]^3, grid_sample convention
            point_feats = jax.vmap(trilinear_point_sample)(grid, norm)
            if self.sampling_img_feats and img_feats is not None:
                # sample first, reduce the [B, P, C_img] result: bilinear
                # interpolation and a pointwise linear layer commute, and
                # P << fH*fW (same output as reducing the whole map)
                sampled = jax.vmap(bilinear_image_sample)(
                    img_feats, points_uv
                )
                point_feats = point_feats + nn.Dense(
                    self.in_channels, name="img_feat_reduce"
                )(sampled)
            output_points = mlp(point_feats)

        return {
            "output_voxels": [output_voxels],
            "output_points": output_points,
        }
