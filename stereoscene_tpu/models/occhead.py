"""Occupancy head: voxel semantic prediction (+ optional point decoder).

Rebuild of ``OccHead`` (ref: occupancy/dense_heads/occhead.py:28-426).
Voxel branch per level: Conv3d(in->in/2, 3x3x3, no bias) -> GN(32) -> ReLU ->
Conv3d(in/2 -> out_channel, 1x1x1, no bias) (ref :96-108). Upsampling to the
ground-truth 256x256x32 grid happens in the loss/inference wrapper (trilinear,
align_corners=False; ref :291-294).

The point branch (``supervise_points``, off in the active config
stereoscene.py:111) samples voxel features trilinearly at query points,
optionally adds projected image features, fuses levels with learned soft
weights, and applies an MLP (ref :171-218).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv3d, GroupNorm, Mlp


def trilinear_point_sample(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Sample [X, Y, Z, C] at normalized points [-1, 1]^3, align_corners=False
    (torch grid_sample semantics used at ref occhead.py:190).

    Args:
      vol: [X, Y, Z, C].
      pts: [P, 3] normalized (x, y, z) in [-1, 1] (torch grid order maps the
        last grid dim to the tensor's fastest spatial dim; here pts[:, 0]
        indexes X, pts[:, 1] Y, pts[:, 2] Z of the XYZ-ordered volume).
    Returns: [P, C]
    """
    dims = jnp.asarray(vol.shape[:3], jnp.float32)
    # align_corners=False: x_idx = ((x + 1) * dim - 1) / 2
    idx = ((pts.astype(jnp.float32) + 1.0) * dims - 1.0) / 2.0

    i0 = jnp.floor(idx).astype(jnp.int32)
    frac = idx - i0.astype(jnp.float32)

    def gather(corner_offsets):
        ii = i0 + jnp.asarray(corner_offsets, jnp.int32)
        inside = jnp.all(
            (ii >= 0) & (ii < jnp.asarray(vol.shape[:3])), axis=-1
        )
        ii = jnp.clip(ii, 0, jnp.asarray(vol.shape[:3]) - 1)
        vals = vol[ii[:, 0], ii[:, 1], ii[:, 2]]
        w = jnp.prod(
            jnp.where(
                jnp.asarray(corner_offsets, bool), frac, 1.0 - frac
            ),
            axis=-1,
        )
        return vals * (w * inside.astype(jnp.float32))[:, None]

    out = jnp.zeros((pts.shape[0], vol.shape[-1]), vol.dtype)
    for cz in (0, 1):
        for cy in (0, 1):
            for cx in (0, 1):
                out = out + gather((cx, cy, cz)).astype(vol.dtype)
    return out


def bilinear_image_sample(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample [H, W, C] at normalized [-1, 1] uv points [P, 2]
    (x over W, y over H; edge-clipped). Shared by OccHead and
    SharedOccHead's image-feature injection."""
    h, w, _ = feat.shape
    xy = (uv.astype(jnp.float32) + 1.0) / 2.0
    px = xy[:, 0] * (w - 1)
    py = xy[:, 1] * (h - 1)
    x0 = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, h - 2)
    fx = px - x0
    fy = py - y0
    v00 = feat[y0, x0]
    v01 = feat[y0, x0 + 1]
    v10 = feat[y0 + 1, x0]
    v11 = feat[y0 + 1, x0 + 1]
    return (
        v00 * ((1 - fx) * (1 - fy))[:, None]
        + v01 * (fx * (1 - fy))[:, None]
        + v10 * ((1 - fx) * fy)[:, None]
        + v11 * (fx * fy)[:, None]
    )


class OccHead(nn.Module):
    in_channels: Sequence[int]
    out_channel: int
    num_level: int = 1
    norm_groups: int = 32
    # point branch (inactive in the scored config)
    supervise_points: bool = False
    sampling_img_feats: bool = False
    soft_weights: bool = False
    in_img_channels: int = 640
    num_img_level: int = 1

    @nn.compact
    def __call__(
        self,
        voxel_feats: List[jnp.ndarray],
        points: Optional[jnp.ndarray] = None,
        img_feats: Optional[jnp.ndarray] = None,
        points_uv: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        assert len(voxel_feats) >= self.num_level
        output_voxels = []
        for i in range(self.num_level):
            mid = self.in_channels[i] // 2
            y = Conv3d(mid, 3, padding=1, use_bias=False,
                       name=f"occ_conv{i}_0")(voxel_feats[i])
            y = GroupNorm(self.norm_groups, name=f"occ_conv{i}_gn")(y)
            y = nn.relu(y)
            y = Conv3d(self.out_channel, 1, use_bias=False,
                       name=f"occ_conv{i}_1")(y)
            output_voxels.append(y)

        output_points = None
        if self.supervise_points and points is not None:
            output_points = self._forward_points(
                points, voxel_feats, img_feats, points_uv
            )
        return {"output_voxels": output_voxels, "output_points": output_points}

    def _forward_points(self, points, voxel_feats, img_feats, points_uv):
        """points: [B, P, 3] normalized to [-1, 1]; returns [B, P, out]."""
        level_feats = []
        for lvl in range(self.num_level):
            vf = voxel_feats[lvl]
            sampled = jax.vmap(trilinear_point_sample)(vf, points)
            level_feats.append(sampled)

        if self.sampling_img_feats and img_feats is not None:
            # points_uv: [B, P, 2] normalized image coords; bilinear sample
            img_sampled = jax.vmap(bilinear_image_sample)(
                img_feats, points_uv
            )
            img_sampled = nn.Dense(
                self.in_channels[0], name="img_feat_reduce"
            )(img_sampled)
            level_feats.append(img_sampled)

        if self.soft_weights:
            n_feats = len(level_feats)
            w = nn.Dense(self.in_channels[0] // 2, name="soft_w1")(
                level_feats[0]
            )
            w = nn.relu(w)
            w = nn.Dense(n_feats, name="soft_w2")(w)
            w = nn.softmax(w, axis=-1)
            fused = sum(
                f * w[..., i:i + 1] for i, f in enumerate(level_feats)
            )
        else:
            fused = sum(level_feats)

        return Mlp(
            self.in_channels[-1], self.out_channel, name="point_occ_mlp"
        )(fused)
