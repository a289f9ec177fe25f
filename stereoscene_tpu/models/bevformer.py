"""BEVFormer-style occupancy transformer (the reference's alternate family).

Capability rebuild of the vendored BEVFormer subsystem
(ref: projects/mmdet3d_plugin/bevformer/ — encoder 402, spatial cross
attention 398, temporal self attention 270, transformer 288; and the
occupancy variants occupancy/modules/ 950, occupancy/detectors/bevocc*.py):

- ``TemporalSelfAttention``: deformable self-attention over BEV queries,
  optionally attending to the ego-motion-aligned previous BEV.
- ``SpatialCrossAttention``: each BEV query lifts a pillar of 3D reference
  points, projects them into every camera with lidar2img, and deformably
  samples multi-level image features there (the CUDA MSDeformAttn becomes
  ops.msdeform_attn gathers).
- ``OccupancyEncoderLayer`` / ``OccupancyEncoder``: pre-norm TSA -> SCA ->
  FFN stacks over a learned BEV query grid.
- ``BEVOccHead``: reshapes encoded queries to the BEV grid and predicts the
  voxel occupancy logits by unfolding a Z axis from channels (the
  channel-to-height decoding the occupancy variants use).

All shapes static; projection math reuses geometry conventions (ego -> pixel
via the KITTI 3x4 P-matrices).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.msdeform_attn import msdeform_attn


class DeformableAttention(nn.Module):
    """Deformable attention: queries predict per-head sampling offsets and
    weights over the given value levels."""

    embed_dim: int
    num_heads: int = 4
    num_points: int = 4
    num_levels: int = 1

    @nn.compact
    def __call__(self, query, value, spatial_shapes, reference_points):
        """query: [B, Q, C]; value: [B, sum(HW), C];
        reference_points: [B, Q, num_levels, 2] normalized to [0, 1]."""
        b, q, _ = query.shape
        n_total = self.num_heads * self.num_levels * self.num_points
        offsets = nn.Dense(n_total * 2, name="sampling_offsets",
                           kernel_init=nn.initializers.zeros)(query)
        offsets = offsets.reshape(
            b, q, self.num_heads, self.num_levels, self.num_points, 2
        )
        weights = nn.Dense(n_total, name="attention_weights")(query)
        weights = nn.softmax(
            weights.reshape(b, q, self.num_heads, -1).astype(jnp.float32),
            axis=-1,
        ).reshape(
            b, q, self.num_heads, self.num_levels, self.num_points
        ).astype(query.dtype)

        value_proj = nn.Dense(self.embed_dim, name="value_proj")(value)
        # normalize offsets by level sizes
        sizes = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], jnp.float32
        )  # [L, 2]
        locs = (
            reference_points[:, :, None, :, None, :]
            + offsets / sizes[None, None, None, :, None, :]
        )
        out = msdeform_attn(
            value_proj, spatial_shapes, locs, weights, self.num_heads
        )
        return nn.Dense(self.embed_dim, name="output_proj")(out)


class SpatialCrossAttention(nn.Module):
    """BEV queries sample projected pillar points in every camera."""

    embed_dim: int
    num_heads: int = 4
    num_points: int = 4
    num_z: int = 4

    @nn.compact
    def __call__(self, query, img_feats, spatial_shapes, ref_points_img,
                 ref_mask):
        """query: [B, Q, C]; img_feats: [B, N_cam, sum(HW), C];
        ref_points_img: [B, N_cam, Q, num_z, 2] normalized image coords;
        ref_mask: [B, N_cam, Q, num_z] validity."""
        b, n_cam = img_feats.shape[:2]
        q = query.shape[1]

        attn = DeformableAttention(
            self.embed_dim, self.num_heads, self.num_points,
            num_levels=len(spatial_shapes), name="deform",
        )
        outputs = []
        weights = []
        for cam in range(n_cam):
            for zi in range(self.num_z):
                ref = ref_points_img[:, cam, :, zi]  # [B, Q, 2]
                ref = jnp.broadcast_to(
                    ref[:, :, None], (b, q, len(spatial_shapes), 2)
                )
                out = attn(query, img_feats[:, cam], spatial_shapes, ref)
                m = ref_mask[:, cam, :, zi].astype(out.dtype)[..., None]
                outputs.append(out * m)
                weights.append(m)
        total = sum(outputs)
        norm = jnp.maximum(sum(weights), 1.0)
        return query + total / norm


class OccupancyEncoderLayer(nn.Module):
    embed_dim: int
    num_heads: int = 4
    ffn_ratio: float = 2.0
    num_z: int = 4

    @nn.compact
    def __call__(self, query, bev_shape, img_feats, spatial_shapes,
                 ref_points_img, ref_mask, prev_bev=None, shift=None):
        # temporal self-attention over the BEV grid (vs prev when provided);
        # with prev_bev, sampling points follow the ego-motion shift
        # (ref: bevformer/modules/encoder.py shift_ref_2d)
        h, w = bev_shape
        grid_y, grid_x = jnp.meshgrid(
            (jnp.arange(h) + 0.5) / h, (jnp.arange(w) + 0.5) / w,
            indexing="ij",
        )
        self_ref = jnp.stack([grid_x, grid_y], -1).reshape(1, h * w, 1, 2)
        self_ref = jnp.broadcast_to(self_ref, (query.shape[0], h * w, 1, 2))
        if prev_bev is not None and shift is not None:
            self_ref = self_ref + shift.astype(self_ref.dtype)[:, None, None, :]

        value = prev_bev if prev_bev is not None else query
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(query).astype(
            query.dtype
        )
        y = DeformableAttention(
            self.embed_dim, self.num_heads, name="self_attn"
        )(y, value, [(h, w)], self_ref)
        query = query + y

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(query).astype(
            query.dtype
        )
        query = SpatialCrossAttention(
            self.embed_dim, self.num_heads, num_z=self.num_z,
            name="cross_attn",
        )(y, img_feats, spatial_shapes, ref_points_img, ref_mask)

        y = nn.LayerNorm(dtype=jnp.float32, name="norm3")(query).astype(
            query.dtype
        )
        y = nn.Dense(int(self.embed_dim * self.ffn_ratio), name="ffn1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dim, name="ffn2")(y)
        return query + y


def ego_motion_shift(
    can_bus: jnp.ndarray,
    bev_shape: Tuple[int, int],
    grid_length: Tuple[float, float],
    use_shift: bool = True,
) -> jnp.ndarray:
    """Normalized BEV shift of the ego between frames, from can_bus deltas.

    Reproduces the reference PerceptionTransformer.get_bev_features ego
    compensation (ref: bevformer/modules/transformer.py:121-140):
    can_bus[0:2] = delta position, can_bus[-2] = ego yaw (radians).

    Args: can_bus [B, 18]. Returns [B, 2] (shift_x, shift_y) in units of the
    normalized BEV grid.
    """
    h, w = bev_shape
    delta_x, delta_y = can_bus[:, 0], can_bus[:, 1]
    ego_angle = can_bus[:, -2] / jnp.pi * 180.0
    translation_length = jnp.sqrt(delta_x**2 + delta_y**2)
    translation_angle = jnp.arctan2(delta_y, delta_x) / jnp.pi * 180.0
    bev_angle = ego_angle - translation_angle
    shift_y = (
        translation_length * jnp.cos(bev_angle / 180.0 * jnp.pi)
        / grid_length[0] / h
    )
    shift_x = (
        translation_length * jnp.sin(bev_angle / 180.0 * jnp.pi)
        / grid_length[1] / w
    )
    scale = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * scale, shift_y * scale], axis=-1)


def rotate_bev(
    prev_bev: jnp.ndarray, angle_deg: jnp.ndarray, bev_shape: Tuple[int, int]
) -> jnp.ndarray:
    """Rotate flattened BEV features about the grid center (bilinear, zero
    fill) — the reference rotates prev_bev by can_bus[-1] degrees with
    torchvision ``rotate`` before temporal attention
    (ref: bevformer/modules/transformer.py:142-155).

    Args: prev_bev [B, H*W, C]; angle_deg [B] counterclockwise degrees.
    """
    h, w = bev_shape
    b, q, c = prev_bev.shape
    grid = prev_bev.reshape(b, h, w, c)
    theta = angle_deg * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )

    def rot_one(g, th):
        # inverse-rotate output coords into source coords
        cos, sin = jnp.cos(th), jnp.sin(th)
        sx = cos * (xs - cx) - sin * (ys - cy) + cx
        sy = sin * (xs - cx) + cos * (ys - cy) + cy
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx, fy = sx - x0, sy - y0

        def tap(yy, xx):
            inside = (
                (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            ).astype(g.dtype)[..., None]
            val = g[jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1)]
            return val * inside

        out = (
            tap(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
            + tap(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
            + tap(y0 + 1, x0) * (fy * (1 - fx))[..., None]
            + tap(y0 + 1, x0 + 1) * (fy * fx)[..., None]
        )
        return out

    return jax.vmap(rot_one)(grid, theta.astype(jnp.float32)).reshape(
        b, q, c
    )


class OccupancyEncoder(nn.Module):
    """Learned BEV queries refined by stacked encoder layers."""

    embed_dim: int = 128
    num_layers: int = 3
    bev_shape: Tuple[int, int] = (64, 64)
    num_z: int = 4
    pc_range: Sequence[float] = (0, -25.6, -2, 51.2, 25.6, 4.4)

    def ref_pillar_points(self):
        """3D reference pillar points per BEV cell: [Q, num_z, 3] ego xyz."""
        h, w = self.bev_shape
        lo = np.asarray(self.pc_range[:3], np.float32)
        hi = np.asarray(self.pc_range[3:], np.float32)
        xs = lo[0] + (np.arange(h) + 0.5) * (hi[0] - lo[0]) / h
        ys = lo[1] + (np.arange(w) + 0.5) * (hi[1] - lo[1]) / w
        zs = lo[2] + (np.arange(self.num_z) + 0.5) * (hi[2] - lo[2]) / self.num_z
        gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
        return np.stack([gx, gy, gz], -1).reshape(h * w, self.num_z, 3)

    use_can_bus: bool = True
    can_bus_norm: bool = True
    rotate_prev_bev: bool = True
    use_shift: bool = True

    @nn.compact
    def __call__(self, img_feats, spatial_shapes, lidar2img, img_size,
                 prev_bev=None, query_pos=None, can_bus=None):
        """img_feats: [B, N_cam, sum(HW), C]; lidar2img: [B, N_cam, 3, 4]
        (P @ Tr); img_size: (H, W) of the raw image; query_pos: optional
        [Q, C] positional embedding added to the initial BEV queries
        (the reference's ``bev_pos``, bevocc_head.py:530-533); can_bus:
        optional [B, 18] ego signals (delta pos in [0:2], yaw in [-2],
        frame-to-frame rotation in [-1] degrees) enabling the reference's
        temporal conditioning (transformer.py:121-161): prev_bev rotation +
        ego-motion-shifted temporal sampling + can_bus MLP query bias."""
        b, n_cam = img_feats.shape[:2]
        h, w = self.bev_shape
        q = h * w

        queries = self.param(
            "bev_queries", nn.initializers.normal(0.02), (q, self.embed_dim)
        )
        if query_pos is not None:
            queries = queries + query_pos.astype(queries.dtype)
        query = jnp.broadcast_to(
            queries[None], (b, q, self.embed_dim)
        ).astype(img_feats.dtype)

        shift = jnp.zeros((b, 2), jnp.float32)
        if can_bus is not None:
            can_bus = can_bus.astype(jnp.float32)
            grid_length = (
                (self.pc_range[4] - self.pc_range[1]) / h,
                (self.pc_range[3] - self.pc_range[0]) / w,
            )
            shift = ego_motion_shift(
                can_bus, self.bev_shape, grid_length, self.use_shift
            )
            if prev_bev is not None and self.rotate_prev_bev:
                prev_bev = rotate_bev(
                    prev_bev, can_bus[:, -1], self.bev_shape
                )
            if self.use_can_bus:
                y = nn.relu(nn.Dense(
                    self.embed_dim, name="can_bus_mlp1")(can_bus))
                y = nn.relu(nn.Dense(
                    self.embed_dim, name="can_bus_mlp2")(y))
                if self.can_bus_norm:
                    y = nn.LayerNorm(name="can_bus_norm")(y)
                query = query + y[:, None, :].astype(query.dtype)

        # project pillar points into each camera
        pts = jnp.asarray(self.ref_pillar_points())  # [Q, Z, 3]
        homo = jnp.concatenate(
            [pts, jnp.ones(pts.shape[:-1] + (1,), pts.dtype)], axis=-1
        )
        pix = jnp.einsum(
            "bnij,qzj->bnqzi", lidar2img.astype(jnp.float32), homo,
            precision=jax.lax.Precision.HIGHEST,
        )
        depth = pix[..., 2]
        uv = pix[..., :2] / jnp.maximum(jnp.abs(depth[..., None]), 1e-5)
        ih, iw = img_size
        ref_img = jnp.stack([uv[..., 0] / iw, uv[..., 1] / ih], axis=-1)
        mask = (
            (depth > 0.1)
            & (ref_img[..., 0] > 0) & (ref_img[..., 0] < 1)
            & (ref_img[..., 1] > 0) & (ref_img[..., 1] < 1)
        )

        for i in range(self.num_layers):
            query = OccupancyEncoderLayer(
                self.embed_dim, num_z=self.num_z, name=f"layer{i}"
            )(query, self.bev_shape, img_feats, spatial_shapes, ref_img,
              mask, prev_bev=prev_bev, shift=shift)
        return query  # [B, Q, C]


class BEVOccHead(nn.Module):
    """Channel-to-height decoding of encoded BEV queries to voxel logits."""

    embed_dim: int = 128
    bev_shape: Tuple[int, int] = (64, 64)
    num_z: int = 8
    out_channel: int = 20

    @nn.compact
    def __call__(self, bev_queries):
        b = bev_queries.shape[0]
        h, w = self.bev_shape
        y = nn.Dense(self.embed_dim * 2, name="decoder1")(bev_queries)
        y = nn.relu(y)
        y = nn.Dense(self.num_z * self.out_channel, name="decoder2")(y)
        return y.reshape(b, h, w, self.num_z, self.out_channel)
