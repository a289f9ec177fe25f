"""Stereo plane-sweep branch: camera-aware matching features, group-wise
correlation volume, disparity->depth warp, and 3D-hourglass cost aggregation.

Rebuild of the reference GwcNet-style encoder
(ref: ViewTransformerLSSVoxel.py:32-224):

- ``StereoFeatureNet`` (ref :32-65): 3x3 reduce conv 640->128 with GN(2),
  SE conditioning on the 30-dim camera embedding, 1x1 -> 64-ch matching
  features. (The reference's ``bn`` on the embedding is Identity here,
  ref :48.)
- ``Hourglass3D`` (ref :70-96): two stride-2 encoder convs, two
  transposed-conv decoders with BatchNorm3d, 1x1 redirect skips.
- ``GwcVolumeEncoder`` (ref :158-224): correlation volume over
  ``max_disp`` disparities with 32 groups -> warp to depth axis ->
  dres0/dres1 residual stem -> three stacked hourglasses -> two heads
  (multi-channel 32-ch and single-channel softmax depth probability).

Volumes are [B, D, H, W, C] channels-last; all convs treat (D, H, W) as the
3D spatial dims.
"""

from __future__ import annotations

import os

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..geometry import disparity_positions
from ..ops.gwc import groupwise_correlation_volume, warp_disparity_to_depth
from ..ops.pallas_gwc import fused_gwc_warp
from .layers import (
    BatchNorm,
    Conv2d,
    Conv3d,
    ConvGN3d,
    ConvTransposeTorch,
    GroupNorm,
    Mlp,
    SELayer,
    agg4d_enabled,
)


class StereoFeatureNet(nn.Module):
    """640-ch neck features -> 64-ch stereo matching features."""

    mid_channels: int = 128
    depth_channels: int = 64
    cam_channels: int = 30

    @nn.compact
    def __call__(self, x, mlp_input):
        # x: [B, H, W, C]; mlp_input: [B, cam_channels]
        y = Conv2d(self.mid_channels, 3, padding=1, name="reduce_conv")(x)
        y = GroupNorm(num_groups=2, name="reduce_gn")(y)
        y = nn.relu(y)
        se = Mlp(self.mid_channels, self.mid_channels, name="depth_mlp")(
            mlp_input.reshape(-1, mlp_input.shape[-1])
        )
        y = SELayer(self.mid_channels, name="depth_se")(y, se)
        return Conv2d(self.depth_channels, 1, name="depth_conv")(y)


class Hourglass3D(nn.Module):
    """Two-level 3D hourglass with redirect skips (ref :70-96)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.channels
        conv1 = nn.relu(
            ConvGN3d(2 * c, 3, stride=2, padding=1, name="conv1")(x)
        )
        conv2 = nn.relu(
            ConvGN3d(2 * c, 3, stride=1, padding=1, name="conv2")(conv1)
        )
        conv3 = nn.relu(
            ConvGN3d(4 * c, 3, stride=2, padding=1, name="conv3")(conv2)
        )
        conv4 = nn.relu(
            ConvGN3d(4 * c, 3, stride=1, padding=1, name="conv4")(conv3)
        )
        up5 = ConvTransposeTorch(
            features=2 * c, kernel_size=3, ndim=3, stride=2, padding=1,
            output_padding=1, use_bias=False, name="conv5_deconv",
        )(conv4)
        up5 = BatchNorm(name="conv5_bn")(up5, train=train)
        redir2 = ConvGN3d(2 * c, 1, stride=1, padding=0, name="redir2")(conv2)
        conv5 = nn.relu(up5 + redir2)

        up6 = ConvTransposeTorch(
            features=c, kernel_size=3, ndim=3, stride=2, padding=1,
            output_padding=1, use_bias=False, name="conv6_deconv",
        )(conv5)
        up6 = BatchNorm(name="conv6_bn")(up6, train=train)
        redir1 = ConvGN3d(c, 1, stride=1, padding=0, name="redir1")(x)
        return nn.relu(up6 + redir1)


class GwcVolumeEncoder(nn.Module):
    """Stereo cost volume encoder. Outputs the multi-channel aggregated
    volume and the single-channel softmax depth probability."""

    max_disp: int
    out_channels: int = 32
    num_groups: int = 32
    feat_mid_channels: int = 128
    match_channels: int = 64
    cam_channels: int = 30
    with_cp: bool = False  # remat each hourglass (B=2 training HBM fit)

    @nn.compact
    def __call__(
        self, feat_left, feat_right, mlp_left, mlp_right, calib,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        b = feat_left.shape[0]
        feats = jnp.concatenate([feat_left, feat_right], axis=0)
        mlps = jnp.concatenate([mlp_left, mlp_right], axis=0)
        match = StereoFeatureNet(
            mid_channels=self.feat_mid_channels,
            depth_channels=self.match_channels,
            cam_channels=self.cam_channels,
            name="feature_withcam",
        )(feats, mlps)
        ref_f, tgt_f = match[:b], match[b:]

        pos = disparity_positions(calib, self.max_disp)
        import jax

        # Mosaic kernels don't lower on CPU; the gate defers to the unfused
        # (math-identical) path when the computation is headed for a CPU
        # device — including CPU-side init of a model that will run on TPU
        # (jax.default_device context). Default "auto": on for single-device
        # TPU (the bench/serving path); pallas_call partitioning under a
        # real multi-chip GSPMD mesh is unvalidated in this environment, so
        # multi-device runs keep the XLA pair unless forced with =1.
        dd = jax.config.jax_default_device
        on_cpu = (jax.default_backend() == "cpu"
                  or (dd is not None and dd.platform == "cpu"))
        gate = os.environ.get("STEREOSCENE_FUSED_GWC", "auto")
        use_fused = gate == "1" or (gate == "auto"
                                    and jax.device_count() == 1)
        if use_fused and not on_cpu:
            # single-pass Pallas kernel: reads the feature maps once, writes
            # the warped volume once (ops/pallas_gwc.py); exact vs the
            # unfused pair (tests/test_pallas_gwc.py)
            vol = fused_gwc_warp(
                ref_f, tgt_f, pos, self.max_disp, self.num_groups,
                out_dtype=feat_left.dtype,
            )
        else:
            vol = groupwise_correlation_volume(
                ref_f, tgt_f, self.max_disp, self.num_groups
            )
            vol = warp_disparity_to_depth(vol, pos).astype(feat_left.dtype)

        c = self.num_groups
        # agg4d: run the ENTIRE cost-aggregation chain (dres stem, three
        # hourglasses, classif heads) on a slice-packed rank-4 [D, H, W, C]
        # tensor — depth is the conv2d batch dim, the depth taps are
        # pad/slice adds, and no 5D conv operand ever exists, so the per-op
        # boundary relayouts that sank the round-3 zpack/dpack/dphase
        # studies (PERF.md) never appear. Exact math, identical param tree
        # (tests/test_agg4d.py). B=1 inference only; training and batched
        # paths keep the 5D graph.
        agg4d = agg4d_enabled(b, train, self.with_cp)
        if agg4d:
            vol = vol[0]  # [D, H, W, C]
        cost0 = nn.relu(ConvGN3d(c, 3, padding=1, name="dres0_0")(vol))
        cost0 = nn.relu(ConvGN3d(c, 3, padding=1, name="dres0_1")(cost0))
        res = nn.relu(ConvGN3d(c, 3, padding=1, name="dres1_0")(cost0))
        res = ConvGN3d(c, 3, padding=1, name="dres1_1")(res)
        cost0 = res + cost0

        hg_cls = (
            nn.remat(Hourglass3D, static_argnums=(2,))
            if self.with_cp else Hourglass3D
        )
        # train positional: nn.remat(static_argnums) ignores keyword args
        out1 = hg_cls(c, name="dres2")(cost0, train)
        out2 = hg_cls(c, name="dres3")(out1, train)
        out3 = hg_cls(c, name="dres4")(out2, train)

        multi = nn.relu(
            ConvGN3d(self.out_channels, 3, padding=1, name="classif3_1")(out3)
        )
        single = Conv3d(1, 3, padding=1, use_bias=False, name="classif3_2")(
            multi
        )[..., 0]
        if agg4d:
            multi = multi[None]           # [1, D, H, W, C]
            single = single[None]         # [1, D, H, W]
        # fp32 softmax island over the depth axis
        prob = nn.softmax(single.astype(jnp.float32), axis=1).astype(
            feat_left.dtype
        )
        return {"multi_channel": multi, "single_channel": prob}
