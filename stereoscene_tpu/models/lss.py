"""LSS view transformer: stereo volume + mono depth + MIE fusion + lift-splat.

Rebuild of ``ViewTransformerLiftSplatShootVoxel``
(ref: ViewTransformerLSSVoxel.py:273-526) as a flax module plus pure
geometry: the module owns the stereo volume encoder, the camera-aware
DepthNet, and the MIE interaction; the caller supplies precomputed voxel
ranks (from geometry.get_geometry -> voxel_indices -> flatten_voxel_ranks)
so the splat is a single fused lift+scatter (ops.lift_splat) instead of the
reference's materialize-then-bev_pool sequence (ref :517-523).

Outputs the pooled voxel features [B, X, Y, Z, C_trans] and the fused depth
distribution [B, D, fH, fW] (used for the depth loss).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.voxel_pool import lift_splat, lift_splat_static
from .depth_net import DepthNet
from .mie import VolumeInteraction
from .stereo_volume import GwcVolumeEncoder


class ViewTransformerLiftSplatShootVoxel(nn.Module):
    num_depth: int
    numC_input: int = 640
    numC_Trans: int = 128
    cam_channels: int = 30
    grid_shape: Tuple[int, int, int] = (128, 128, 16)
    attention_chunk: int = 1024
    # group alignment of host-built static splat plans (ops/splat_plan.py).
    # A module attribute (static at trace time) rather than a leaf of the
    # runtime ``ranks`` tuple: under nn.remat non-static args are
    # abstractified, and a traced group would break the `group > 1` branch
    # selection in lift_splat_static. MUST match the ``group=`` the plan was
    # built with (SplatPlanCache enforces this against the detector cfg).
    splat_group: int = 1
    # fine-grained remat: checkpoint each hourglass / MIE block so the
    # backward recomputes one block at a time. Whole-stage remat alone
    # leaves the peak inside this stage's own recompute (B=2 train OOM
    # 17.71G/15.75G measured with stage-level remat only).
    with_cp: bool = False

    @nn.compact
    def __call__(
        self,
        feat_left,      # [B, fH, fW, C_in]
        feat_right,     # [B, fH, fW, C_in]
        mlp_left,       # [B, cam_channels]
        mlp_right,      # [B, cam_channels]
        calib,          # [B]
        ranks,          # [B, D * fH * fW] voxel ranks (dynamic path), or a
                        # (order, ranks_sorted) tuple from a host-side static
                        # splat plan (ops/splat_plan.py)
        train: bool = False,
    ):
        # stereo branch -> depth probability (ref :489-490)
        stereo = GwcVolumeEncoder(
            max_disp=self.num_depth,
            cam_channels=self.cam_channels,
            with_cp=self.with_cp,
            name="stereo_volume_net",
        )(feat_left, feat_right, mlp_left, mlp_right, calib, train=train)
        stereo_prob = stereo["single_channel"]  # [B, D, fH, fW]

        # monocular branch: depth logits + context features (ref :502-505)
        dn_out = DepthNet(
            mid_channels=self.numC_input,
            context_channels=self.numC_Trans,
            depth_channels=self.num_depth,
            cam_channels=self.cam_channels,
            name="depth_net",
        )(feat_left, mlp_left, train=train)
        depth_digit = dn_out[..., : self.num_depth]
        img_feat = dn_out[..., self.num_depth:self.num_depth + self.numC_Trans]
        # [B, fH, fW, D] -> [B, D, fH, fW], fp32 softmax island
        lss_prob = nn.softmax(
            depth_digit.astype(jnp.float32), axis=-1
        ).transpose(0, 3, 1, 2).astype(feat_left.dtype)

        # MIE fusion (ref :508)
        vi_cls = (
            nn.remat(VolumeInteraction, static_argnums=(3,))
            if self.with_cp else VolumeInteraction
        )
        fused_prob = vi_cls(
            attention_chunk=self.attention_chunk, with_cp=self.with_cp,
            name="volume_interaction",
        )(stereo_prob, lss_prob, train)

        # fused lift + splat (ref :517-523); fp32 accumulate in the reduction
        if isinstance(ranks, tuple):
            order, ranks_sorted = ranks[0], ranks[1]
            bounds = ranks[2] if len(ranks) > 2 else None
            group = self.splat_group
            bev_feat = lift_splat_static(
                fused_prob.astype(jnp.float32),
                img_feat.astype(jnp.float32),
                order, ranks_sorted, self.grid_shape, group=group,
                bounds=bounds,
            ).astype(feat_left.dtype)
        else:
            bev_feat = lift_splat(
                fused_prob.astype(jnp.float32),
                img_feat.astype(jnp.float32),
                ranks,
                self.grid_shape,
            ).astype(feat_left.dtype)

        return bev_feat, fused_prob
