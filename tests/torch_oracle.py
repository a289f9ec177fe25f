"""Torch transcription of the full active StereoScene graph at tiny shapes.

This is an *independent* re-implementation of the reference forward pass
(NOT our flax code translated back): module structure, state_dict key
layout, and op semantics follow the reference sources cited per class, so
that ``state_dict()`` of :class:`TorchStereoScene` can be pushed through
``utils.convert_reference.convert_reference_checkpoint`` and the resulting
flax model must reproduce the torch logits end-to-end (the round-2 golden
parity harness, VERDICT item 2).

Everything runs on CPU in fp32 and in eval() mode (BN uses running stats,
dropout/droppath off) to keep the comparison deterministic.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from stereoscene_tpu.models.efficientnet import scaled_stage_settings


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def swish(x):
    return F.silu(x)


class Conv2dSamePad(nn.Conv2d):
    """TF-SAME adaptive padding conv (mmcv Conv2dAdaptivePadding,
    ref: efficientnet.py:374 conv_cfg=dict(type='Conv2dAdaptivePadding'))."""

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        sh, sw = self.stride
        ph = max((math.ceil(ih / sh) - 1) * sh + kh - ih, 0)
        pw = max((math.ceil(iw / sw) - 1) * sw + kw - iw, 0)
        x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
        return F.conv2d(x, self.weight, self.bias, self.stride, 0,
                        self.dilation, self.groups)


class ConvModule2d(nn.Module):
    """mmcv ConvModule(.conv/.bn) with BN(eps 1e-3) + Swish
    (ref: efficientnet.py:365-381 norm_cfg/act_cfg)."""

    def __init__(self, cin, cout, k, stride=1, groups=1, act=True):
        super().__init__()
        self.conv = Conv2dSamePad(cin, cout, k, stride=stride, groups=groups,
                                  bias=False)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)
        self._act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return swish(x) if self._act else x


# ---------------------------------------------------------------------------
# EfficientNet backbone (ref: occupancy/backbones/efficientnet.py:275-534)
# ---------------------------------------------------------------------------


class TorchEffSE(nn.Module):
    """mmdet SELayer: se.conv1.conv / se.conv2.conv 1x1 with Swish/Sigmoid
    (ref: efficientnet.py:455-470 se_cfg)."""

    def __init__(self, channels, squeeze):
        super().__init__()
        self.conv1 = nn.Module()
        self.conv1.conv = nn.Conv2d(channels, squeeze, 1)
        self.conv2 = nn.Module()
        self.conv2.conv = nn.Conv2d(squeeze, channels, 1)

    def forward(self, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = swish(self.conv1.conv(s))
        s = torch.sigmoid(self.conv2.conv(s))
        return x * s


class TorchInvertedResidual(nn.Module):
    """MBConv (ref: efficientnet.py:112-229)."""

    def __init__(self, cin, cout, kernel, stride, expand_ratio, se_ratio):
        super().__init__()
        mid = cin * expand_ratio
        self.with_res = stride == 1 and cin == cout
        if mid != cin:
            self.expand_conv = ConvModule2d(cin, mid, 1)
        self.depthwise_conv = ConvModule2d(mid, mid, kernel, stride=stride,
                                           groups=mid)
        if se_ratio > 0:
            squeeze = max(1, int(mid // (expand_ratio * se_ratio)))
            self.se = TorchEffSE(mid, squeeze)
        self.linear_conv = ConvModule2d(mid, cout, 1, act=False)

    def forward(self, x):
        out = x
        if hasattr(self, "expand_conv"):
            out = self.expand_conv(out)
        out = self.depthwise_conv(out)
        if hasattr(self, "se"):
            out = self.se(out)
        out = self.linear_conv(out)
        if self.with_res:
            out = x + out  # drop_path is identity in eval
        return out


class TorchEfficientNet(nn.Module):
    """layers.0 = stem, layers.1..5 = block stages, layers.6 = head conv
    (ref: efficientnet.py:417-441,509)."""

    def __init__(self, arch="b0", out_indices=(2, 3, 4, 5, 6)):
        super().__init__()
        stem_ch, stages, head_ch = scaled_stage_settings(arch)
        self.out_indices = out_indices
        layers = [ConvModule2d(3, stem_ch, 3, stride=2)]
        cin = stem_ch
        for stage in stages:
            blocks = []
            for (k, c, se, s, e) in stage:
                blocks.append(TorchInvertedResidual(cin, c, k, s, e, se))
                cin = c
            layers.append(nn.Sequential(*blocks))
        layers.append(ConvModule2d(cin, head_ch, 1))
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        outs = []
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i in self.out_indices:
                outs.append(x)
        return outs


# ---------------------------------------------------------------------------
# SECONDFPN image neck (mmdet3d SECONDFPN; config stereoscene.py:70-74)
# ---------------------------------------------------------------------------


class TorchSECONDFPN(nn.Module):
    def __init__(self, in_channels, out_channels, upsample_strides):
        super().__init__()
        deblocks = []
        for cin, cout, s in zip(in_channels, out_channels, upsample_strides):
            if s >= 1:
                up = nn.ConvTranspose2d(cin, cout, int(s), stride=int(s),
                                        bias=False)
            else:
                k = int(round(1 / s))
                up = nn.Conv2d(cin, cout, k, stride=k, bias=False)
            deblocks.append(nn.Sequential(
                up, nn.BatchNorm2d(cout, eps=1e-3, momentum=0.01),
                nn.ReLU()))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, feats):
        ups = [d(f) for d, f in zip(self.deblocks, feats)]
        return torch.cat(ups, dim=1)


# ---------------------------------------------------------------------------
# stereo branch (ref: ViewTransformerLSSVoxel.py:32-224)
# ---------------------------------------------------------------------------


def convbn_3d(cin, cout, k, stride, pad, gn_groups=2):
    return nn.Sequential(
        nn.Conv3d(cin, cout, k, stride=stride, padding=pad, bias=False),
        nn.GroupNorm(gn_groups, cout))


class TorchMlp(nn.Module):
    """fc1 -> ReLU -> fc2 (ref: ViewTransformerLSSBEVDepth.py:417-439)."""

    def __init__(self, cin, hidden, cout):
        super().__init__()
        self.fc1 = nn.Linear(cin, hidden)
        self.fc2 = nn.Linear(hidden, cout)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class TorchSELayer(nn.Module):
    """Camera-aware SE (ref: ViewTransformerLSSBEVDepth.py:442-454)."""

    def __init__(self, channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, channels, 1)
        self.conv_expand = nn.Conv2d(channels, channels, 1)

    def forward(self, x, x_se):
        s = F.relu(self.conv_reduce(x_se))
        s = self.conv_expand(s)
        return x * torch.sigmoid(s)


class TorchStereoFeatureNet(nn.Module):
    """ref: ViewTransformerLSSVoxel.py:32-65."""

    def __init__(self, in_channels, mid_channels, depth_channels,
                 cam_channels):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_channels, mid_channels, 3, padding=1),
            nn.GroupNorm(2, mid_channels),
            nn.ReLU())
        self.depth_mlp = TorchMlp(cam_channels, mid_channels, mid_channels)
        self.depth_se = TorchSELayer(mid_channels)
        self.depth_conv = nn.Sequential(
            nn.Conv2d(mid_channels, depth_channels, 1))

    def forward(self, x, mlp_input):
        mlp_input = mlp_input.reshape(-1, mlp_input.shape[-1])
        x = self.reduce_conv(x)
        se = self.depth_mlp(mlp_input)[..., None, None]
        x = self.depth_se(x, se)
        return self.depth_conv(x)


class TorchHourglass(nn.Module):
    """ref: ViewTransformerLSSVoxel.py:70-96."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Sequential(convbn_3d(c, 2 * c, 3, 2, 1), nn.ReLU())
        self.conv2 = nn.Sequential(convbn_3d(2 * c, 2 * c, 3, 1, 1),
                                   nn.ReLU())
        self.conv3 = nn.Sequential(convbn_3d(2 * c, 4 * c, 3, 2, 1),
                                   nn.ReLU())
        self.conv4 = nn.Sequential(convbn_3d(4 * c, 4 * c, 3, 1, 1),
                                   nn.ReLU())
        self.conv5 = nn.Sequential(
            nn.ConvTranspose3d(4 * c, 2 * c, 3, padding=1, output_padding=1,
                               stride=2, bias=False),
            nn.BatchNorm3d(2 * c))
        self.conv6 = nn.Sequential(
            nn.ConvTranspose3d(2 * c, c, 3, padding=1, output_padding=1,
                               stride=2, bias=False),
            nn.BatchNorm3d(c))
        self.redir1 = convbn_3d(c, c, 1, 1, 0)
        self.redir2 = convbn_3d(2 * c, 2 * c, 1, 1, 0)

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c5 = F.relu(self.conv5(c4) + self.redir2(c2))
        return F.relu(self.conv6(c5) + self.redir1(x))


def build_gwc_volume(ref_f, tgt_f, maxdisp, num_groups):
    """ref: ViewTransformerLSSVoxel.py:98-113."""
    b, c, h, w = ref_f.shape
    cpg = c // num_groups
    vol = ref_f.new_zeros(b, num_groups, maxdisp, h, w)
    for i in range(maxdisp):
        if i > 0:
            prod = ref_f[:, :, :, i:] * tgt_f[:, :, :, :-i]
            vol[:, :, i, :, i:] = prod.view(
                b, num_groups, cpg, h, w - i).mean(dim=2)
        else:
            vol[:, :, 0] = (ref_f * tgt_f).view(
                b, num_groups, cpg, h, w).mean(dim=2)
    return vol


def warp_disp_to_depth(vol, calib):
    """Disparity -> depth warp: depth bin k (1-indexed) samples disparity
    position calib/(4k), linear interp, zero padding
    (ref: ViewTransformerLSSVoxel.py:128-156 with down=1)."""
    b, g, d, h, w = vol.shape
    k = torch.arange(1, d + 1, dtype=torch.float32)
    pos = calib.float()[:, None] / 4.0 / k[None, :]  # [B, D]
    i0 = torch.floor(pos).long()
    frac = (pos - i0.float()).view(b, 1, d, 1, 1)

    def gather(i):
        valid = ((i >= 0) & (i <= d - 1)).float().view(b, 1, d, 1, 1)
        ic = i.clamp(0, d - 1).view(b, 1, d, 1, 1).expand(b, g, d, h, w)
        return vol.gather(2, ic) * valid

    return gather(i0) * (1 - frac) + gather(i0 + 1) * frac


class TorchGwcEncoder(nn.Module):
    """ref: GwcNet_volume_encoder, ViewTransformerLSSVoxel.py:158-224."""

    def __init__(self, maxdisp, in_channels, out_c=32, num_groups=32,
                 mid_channels=128, match_channels=64, cam_channels=30):
        super().__init__()
        self.maxdisp = maxdisp
        self.num_groups = num_groups
        self.feature_withcam = TorchStereoFeatureNet(
            in_channels, mid_channels, match_channels, cam_channels)
        self.dres0 = nn.Sequential(convbn_3d(num_groups, 32, 3, 1, 1),
                                   nn.ReLU(),
                                   convbn_3d(32, 32, 3, 1, 1), nn.ReLU())
        self.dres1 = nn.Sequential(convbn_3d(32, 32, 3, 1, 1), nn.ReLU(),
                                   convbn_3d(32, 32, 3, 1, 1))
        self.dres2 = TorchHourglass(32)
        self.dres3 = TorchHourglass(32)
        self.dres4 = TorchHourglass(32)
        self.classif3_1 = nn.Sequential(convbn_3d(32, out_c, 3, 1, 1),
                                        nn.ReLU())
        self.classif3_2 = nn.Sequential(
            nn.Conv3d(out_c, 1, 3, padding=1, bias=False))

    def forward(self, left, right, mlp_left, mlp_right, calib):
        b = left.shape[0]
        feats = torch.cat([left, right], 0)
        mlps = torch.cat([mlp_left, mlp_right], 0)
        fea = self.feature_withcam(feats, mlps)
        ref_f, tgt_f = fea[:b], fea[b:]
        vol = build_gwc_volume(ref_f, tgt_f, self.maxdisp, self.num_groups)
        vol = warp_disp_to_depth(vol, calib)
        cost0 = self.dres0(vol)
        cost0 = self.dres1(cost0) + cost0
        out3 = self.dres4(self.dres3(self.dres2(cost0)))
        cost3_1 = self.classif3_1(out3)
        cost3 = self.classif3_2(cost3_1).squeeze(1)
        return {"multi_channel": cost3_1,
                "single_channel": F.softmax(cost3, dim=1)}


# ---------------------------------------------------------------------------
# MIE (ref: attention.py:45-120, ViewTransformerLSSVoxel.py:227-268)
# ---------------------------------------------------------------------------


class TorchBRIAttention(nn.Module):
    """ref: attention.py:45-86."""

    def __init__(self):
        super().__init__()
        self.query_conv = nn.Conv3d(1, 1, 1)
        self.key_conv = nn.Conv3d(1, 1, 1)
        self.value_conv = nn.Conv3d(1, 1, 1)
        self.gamma = nn.Parameter(torch.zeros(1))

    def forward(self, q, kv):
        x = kv
        b, c, d, h, w = x.shape
        conf = F.softmax(q, dim=2).max(dim=2)[0].view(b, -1, w * h)
        pq = self.query_conv(q).view(b, -1, w * h).permute(0, 2, 1)
        pk = self.key_conv(x).view(b, -1, w * h)
        att = F.softmax(torch.bmm(pq, pk), dim=-1)
        att = conf * att
        pv = self.value_conv(x).view(b, -1, w * h)
        out = torch.bmm(pv, att.permute(0, 2, 1)).view(b, c, d, h, w)
        return self.gamma * out + x


class TorchCA3D(nn.Module):
    """ref: attention.py:90-120."""

    def __init__(self, channel):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv3d(channel, channel, 3, padding=1), nn.GELU(),
            nn.GroupNorm(1, channel))
        self.conv2 = nn.Sequential(
            nn.Conv3d(channel, channel // 8, 1), nn.GELU(),
            nn.Conv3d(channel // 8, channel, 1), nn.GELU())
        self.conv = nn.Sequential(
            nn.Conv3d(channel, channel, 3, padding=1), nn.GELU(),
            nn.GroupNorm(1, channel))

    def forward(self, x):
        data = self.conv1(x)
        pool = data.mean(dim=(2, 3, 4), keepdim=True)
        weight = torch.sigmoid(self.conv2(pool))
        return self.conv(weight * data)


class TorchResidual(nn.Module):
    """ref: ViewTransformerLSSVoxel.py Residual (alpha * fn(x) + x)."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn
        self.alpha = nn.Parameter(torch.zeros(1))

    def forward(self, x):
        return self.alpha * self.fn(x) + x


class TorchVolumeInteraction(nn.Module):
    """ref: ViewTransformerLSSVoxel.py:236-268."""

    def __init__(self):
        super().__init__()
        self.redir1 = nn.Conv3d(2, 32, 3, padding=1)
        self.dres1 = TorchHourglass(32)
        self.redir2 = nn.Conv3d(32, 1, 3, padding=1)
        self.lss2stereo = TorchBRIAttention()
        self.stereo2lss = TorchBRIAttention()
        self.CA3D = TorchResidual(TorchCA3D(32))

    def forward(self, stereo_volume, lss_volume):
        stereo_volume = stereo_volume.unsqueeze(1)
        lss_volume = lss_volume.unsqueeze(1)
        lss_g = self.lss2stereo(q=stereo_volume, kv=lss_volume)
        stereo_g = self.stereo2lss(q=lss_volume, kv=stereo_volume)
        data = F.relu(self.redir1(torch.cat((lss_g, stereo_g), dim=1)))
        data = self.CA3D(self.dres1(data))
        data = F.relu(self.redir2(data)).squeeze(1)
        return F.softmax(data, dim=1)


# ---------------------------------------------------------------------------
# DepthNet (ref: ViewTransformerLSSBEVDepth.py:343-517)
# ---------------------------------------------------------------------------


class TorchBasicBlock2d(nn.Module):
    """mmdet ResNet BasicBlock (stride 1, same width)."""

    def __init__(self, c):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + x)


class _TorchASPPModule(nn.Module):
    def __init__(self, cin, cout, k, padding, dilation):
        super().__init__()
        self.atrous_conv = nn.Conv2d(cin, cout, k, padding=padding,
                                     dilation=dilation, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.atrous_conv(x)))


class TorchASPP(nn.Module):
    """ref: ViewTransformerLSSBEVDepth.py:343-414 (GAP branch GN(2))."""

    def __init__(self, cin, mid):
        super().__init__()
        self.aspp1 = _TorchASPPModule(cin, mid, 1, 0, 1)
        self.aspp2 = _TorchASPPModule(cin, mid, 3, 6, 6)
        self.aspp3 = _TorchASPPModule(cin, mid, 3, 12, 12)
        self.aspp4 = _TorchASPPModule(cin, mid, 3, 18, 18)
        self.global_avg_pool = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, 1)),
            nn.Conv2d(cin, mid, 1, bias=False),
            nn.GroupNorm(2, mid),
            nn.ReLU())
        self.conv1 = nn.Conv2d(mid * 5, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)

    def forward(self, x):
        xs = [self.aspp1(x), self.aspp2(x), self.aspp3(x), self.aspp4(x)]
        x5 = self.global_avg_pool(x)
        x5 = x5.expand(-1, -1, *xs[0].shape[-2:])  # constant 1x1 upsample
        y = torch.cat(xs + [x5], dim=1)
        return F.relu(self.bn1(self.conv1(y)))  # dropout off in eval


class TorchDCN(nn.Module):
    """mmcv DeformConv2dPack (DCNv1, groups=4, no bias), evaluated with its
    zero-initialized offsets so the op equals a grouped 3x3 conv — the
    offset head stays part of the state_dict for converter coverage
    (ref: ViewTransformerLSSBEVDepth.py:490-498)."""

    def __init__(self, c, groups=4):
        super().__init__()
        self.groups = groups
        self.weight = nn.Parameter(torch.empty(c, c // groups, 3, 3))
        nn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
        self.conv_offset = nn.Conv2d(c, 18, 3, padding=1)
        nn.init.zeros_(self.conv_offset.weight)
        nn.init.zeros_(self.conv_offset.bias)

    def forward(self, x):
        assert float(self.conv_offset.weight.abs().max()) == 0.0
        return F.conv2d(x, self.weight, None, padding=1, groups=self.groups)


class TorchDepthNet(nn.Module):
    """ref: ViewTransformerLSSBEVDepth.py:457-517."""

    def __init__(self, in_channels, mid, context_channels, depth_channels,
                 cam_channels=30):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_channels, mid, 3, padding=1),
            nn.GroupNorm(2, mid), nn.ReLU())
        self.context_conv = nn.Conv2d(mid, context_channels, 1)
        self.bn = nn.GroupNorm(2, cam_channels)
        self.depth_mlp = TorchMlp(cam_channels, mid, mid)
        self.depth_se = TorchSELayer(mid)
        self.context_mlp = TorchMlp(cam_channels, mid, mid)
        self.context_se = TorchSELayer(mid)
        self.depth_conv = nn.Sequential(
            TorchBasicBlock2d(mid), TorchBasicBlock2d(mid),
            TorchBasicBlock2d(mid), TorchASPP(mid, mid), TorchDCN(mid),
            nn.Conv2d(mid, depth_channels, 1))

    def forward(self, x, mlp_input):
        mlp_input = self.bn(mlp_input.reshape(-1, mlp_input.shape[-1]))
        x = self.reduce_conv(x)
        ctx_se = self.context_mlp(mlp_input)[..., None, None]
        context = self.context_conv(self.context_se(x, ctx_se))
        dep_se = self.depth_mlp(mlp_input)[..., None, None]
        depth = self.depth_conv(self.depth_se(x, dep_se))
        return torch.cat([depth, context], dim=1)


# ---------------------------------------------------------------------------
# 3D encoder + neck + head
# ---------------------------------------------------------------------------


class TorchBasicBlock3d(nn.Module):
    """ref: occupancy/backbones/resnet3d.py:35-66."""

    def __init__(self, cin, planes, stride=1, gn_groups=32,
                 with_downsample=False):
        super().__init__()
        self.conv1 = nn.Conv3d(cin, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.GroupNorm(gn_groups, planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.GroupNorm(gn_groups, planes)
        if with_downsample:
            self.downsample = nn.Sequential(
                nn.Conv3d(cin, planes, 1, stride=stride, bias=False),
                nn.GroupNorm(gn_groups, planes))

    def forward(self, x):
        residual = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if hasattr(self, "downsample"):
            residual = self.downsample(x)
        return F.relu(out + residual)


class TorchResNet3D(nn.Module):
    """ref: occupancy/backbones/resnet3d.py:107-245 (depth 18, GN)."""

    def __init__(self, in_channels, block_inplanes, block_strides,
                 blocks_per_stage, gn_groups=32):
        super().__init__()
        self.input_proj = nn.Sequential(
            nn.Conv3d(in_channels, block_inplanes[0], 1, bias=False),
            nn.GroupNorm(gn_groups, block_inplanes[0]),
            nn.ReLU())
        layers = []
        cin = block_inplanes[0]
        for planes, stride, n in zip(block_inplanes, block_strides,
                                     blocks_per_stage):
            stage = [TorchBasicBlock3d(
                cin, planes, stride, gn_groups,
                with_downsample=(stride != 1 or cin != planes))]
            for _ in range(1, n):
                stage.append(TorchBasicBlock3d(planes, planes, 1, gn_groups))
            layers.append(nn.Sequential(*stage))
            cin = planes
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        x = self.input_proj(x)
        outs = []
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        return outs


class TorchSECONDFPN3D(nn.Module):
    """ref: occupancy/necks/second_fpn_3d.py:13-117."""

    def __init__(self, in_channels, out_channels, upsample_strides,
                 gn_groups=32):
        super().__init__()
        deblocks = []
        for cin, cout, s in zip(in_channels, out_channels, upsample_strides):
            deblocks.append(nn.Sequential(
                nn.ConvTranspose3d(cin, cout, int(s), stride=int(s),
                                   bias=False),
                nn.GroupNorm(gn_groups, cout), nn.ReLU()))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, feats):
        ups = [d(f) for d, f in zip(self.deblocks, feats)]
        return torch.cat(ups, dim=1)


class TorchOccHead(nn.Module):
    """Voxel branch (ref: occupancy/dense_heads/occhead.py:96-108)."""

    def __init__(self, in_channels, out_channel, gn_groups=32):
        super().__init__()
        mid = in_channels // 2
        self.occ_convs = nn.ModuleList([nn.Sequential(
            nn.Conv3d(in_channels, mid, 3, padding=1, bias=False),
            nn.GroupNorm(gn_groups, mid), nn.ReLU(),
            nn.Conv3d(mid, out_channel, 1, bias=False))])

    def forward(self, x):
        return [self.occ_convs[0](x)]


# ---------------------------------------------------------------------------
# geometry (pure functions; ref: ViewTransformerLSSBEVDepth.py:110-201,604-659)
# ---------------------------------------------------------------------------


def torch_create_frustum(input_size, downsample, dbound):
    h, w = input_size
    fh, fw = h // downsample, w // downsample
    ds = torch.arange(*dbound, dtype=torch.float32).view(-1, 1, 1).expand(
        -1, fh, fw)
    d = ds.shape[0]
    xs = torch.linspace(0, w - 1, fw).view(1, 1, fw).expand(d, fh, fw)
    ys = torch.linspace(0, h - 1, fh).view(1, fh, 1).expand(d, fh, fw)
    return torch.stack((xs, ys, ds), -1)


def torch_get_geometry(frustum, rots, trans, intrins, post_rots, post_trans,
                       bda):
    b, n, _ = trans.shape
    points = frustum - post_trans.view(b, n, 1, 1, 1, 3)
    points = torch.inverse(post_rots).view(b, n, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1))
    points = torch.cat(
        (points[..., :2, :] * points[..., 2:3, :], points[..., 2:3, :]), 5)
    if intrins.shape[-1] == 4:  # KITTI P-matrix translation column
        shift = intrins[:, :, :3, 3]
        points = points - shift.view(b, n, 1, 1, 1, 3, 1)
        intrins = intrins[:, :, :3, :3]
    combine = rots.matmul(torch.inverse(intrins))
    points = combine.view(b, n, 1, 1, 1, 3, 3).matmul(points).squeeze(-1)
    points = points + trans.view(b, n, 1, 1, 1, 3)
    points = bda.view(b, 1, 1, 1, 1, 3, 3).matmul(
        points.unsqueeze(-1)).squeeze(-1)
    return points


def torch_get_mlp_input(rot, tran, intrin, post_rot, post_tran, bda):
    b, n = rot.shape[:2]
    bda = bda.view(b, 1, 3, 3).repeat(1, n, 1, 1)
    mlp = torch.stack([
        intrin[:, :, 0, 0], intrin[:, :, 1, 1],
        intrin[:, :, 0, 2], intrin[:, :, 1, 2],
        intrin[:, :, 0, 3], intrin[:, :, 1, 3], intrin[:, :, 2, 3],
        post_rot[:, :, 0, 0], post_rot[:, :, 0, 1], post_tran[:, :, 0],
        post_rot[:, :, 1, 0], post_rot[:, :, 1, 1], post_tran[:, :, 1],
        bda[:, :, 0, 0], bda[:, :, 0, 1], bda[:, :, 1, 0],
        bda[:, :, 1, 1], bda[:, :, 2, 2],
    ], dim=-1)
    sensor2ego = torch.cat([rot, tran.reshape(b, n, 3, 1)],
                           dim=-1).reshape(b, n, -1)
    return torch.cat([mlp, sensor2ego], dim=-1)


def torch_voxel_pooling(geom, x, xbound, ybound, zbound):
    """Sum-splat into the [B, C, X, Y, Z] grid
    (ref: ViewTransformerLSSVoxel.py:432-476, sans bev_pool)."""
    b, n, d, h, w, c = x.shape
    dx = torch.tensor([xbound[2], ybound[2], zbound[2]])
    bx = torch.tensor([xbound[0] + xbound[2] / 2.0,
                       ybound[0] + ybound[2] / 2.0,
                       zbound[0] + zbound[2] / 2.0])
    nx = [int(round((bound[1] - bound[0]) / bound[2]))
          for bound in (xbound, ybound, zbound)]
    nprime = b * n * d * h * w
    x = x.reshape(nprime, c)
    idx = ((geom - (bx - dx / 2.0)) / dx).long().view(nprime, 3)
    batch_ix = torch.arange(b).view(b, 1).expand(b, nprime // b).reshape(-1)
    kept = ((idx[:, 0] >= 0) & (idx[:, 0] < nx[0])
            & (idx[:, 1] >= 0) & (idx[:, 1] < nx[1])
            & (idx[:, 2] >= 0) & (idx[:, 2] < nx[2]))
    x, idx, batch_ix = x[kept], idx[kept], batch_ix[kept]
    flat = ((batch_ix * nx[0] + idx[:, 0]) * nx[1] + idx[:, 1]) * nx[2] \
        + idx[:, 2]
    out = torch.zeros(b * nx[0] * nx[1] * nx[2], c, dtype=x.dtype)
    out.index_add_(0, flat, x)
    return out.view(b, nx[0], nx[1], nx[2], c).permute(0, 4, 1, 2, 3)


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class TorchStereoScene(nn.Module):
    """The active BEVDepthOccupancy graph
    (ref: occupancy/detectors/bevdepth_occupancy.py:83-128)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.img_backbone = TorchEfficientNet(
            cfg.backbone_arch, cfg.backbone_out_indices)
        self.img_neck = TorchSECONDFPN(
            cfg.neck_in_channels, cfg.neck_out_channels,
            cfg.neck_upsample_strides)
        numc_input = sum(cfg.neck_out_channels)

        vt = nn.Module()
        vt.stereo_volume_net = TorchGwcEncoder(
            cfg.num_depth, in_channels=numc_input,
            cam_channels=cfg.cam_channels)
        vt.depth_net = TorchDepthNet(
            numc_input, numc_input, cfg.numC_Trans, cfg.num_depth,
            cfg.cam_channels)
        vt.volume_interaction = TorchVolumeInteraction()
        self.img_view_transformer = vt

        blocks = {10: 1, 18: 2}[cfg.resnet_depth]
        self.img_bev_encoder_backbone = TorchResNet3D(
            cfg.numC_Trans, list(cfg.voxel_channels),
            list(cfg.voxel_strides), [blocks] * len(cfg.voxel_channels),
            cfg.norm_groups)
        self.img_bev_encoder_neck = TorchSECONDFPN3D(
            cfg.voxel_channels, cfg.voxel_out_channels,
            cfg.fpn3d_upsample_strides, cfg.norm_groups)
        self.pts_bbox_head = TorchOccHead(
            sum(cfg.voxel_out_channels), cfg.out_channel, cfg.norm_groups)

        self.frustum = torch_create_frustum(
            cfg.input_size, cfg.downsample, cfg.dbound)

    def forward(self, batch):
        # grad-enabled (the backward-parity test differentiates through the
        # oracle); output-only parity callers wrap with torch.no_grad()
        cfg = self.cfg
        imgs = batch["imgs"]  # [B, 2, H, W, 3] channels-last
        b = imgs.shape[0]
        x = torch.cat([imgs[:, 0], imgs[:, 1]], 0).permute(0, 3, 1, 2)
        feats = self.img_backbone(x)
        neck = self.img_neck(feats)
        left, right = neck[:b], neck[b:]

        mlp = torch_get_mlp_input(
            batch["rots"], batch["trans"], batch["intrins"],
            batch["post_rots"], batch["post_trans"], batch["bda"])

        vt = self.img_view_transformer
        stereo = vt.stereo_volume_net(
            left, right, mlp[:, 0], mlp[:, 1], batch["calib"])

        dn = vt.depth_net(left, mlp[:, 0])
        d = cfg.num_depth
        depth_digit = dn[:, :d]
        img_feat = dn[:, d:d + cfg.numC_Trans]
        lss_prob = F.softmax(depth_digit, dim=1)

        depth_prob = vt.volume_interaction(stereo["single_channel"], lss_prob)

        volume = depth_prob.unsqueeze(1) * img_feat.unsqueeze(2)
        # [B, C, D, fH, fW] -> [B, N=1, D, fH, fW, C]
        volume = volume.unsqueeze(1).permute(0, 1, 3, 4, 5, 2)

        geom = torch_get_geometry(
            self.frustum, batch["rots"][:, :1], batch["trans"][:, :1],
            batch["intrins"][:, :1], batch["post_rots"][:, :1],
            batch["post_trans"][:, :1], batch["bda"])
        bev = torch_voxel_pooling(
            geom, volume, cfg.xbound, cfg.ybound, cfg.zbound)

        voxel_outs = self.img_bev_encoder_backbone(bev)
        fused = self.img_bev_encoder_neck(voxel_outs)
        logits = self.pts_bbox_head(fused)[0]
        return {"output_voxels": logits, "depth_prob": depth_prob}


def randomize_state(model: nn.Module, seed: int = 0) -> None:
    """Make every tensor informative: keep torch's default weight inits,
    randomize BN running stats and zero-initialized affine/gate params.
    DCN offsets must stay zero (the oracle relies on it)."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for name, t in sd.items():
        if "conv_offset" in name or "num_batches_tracked" in name:
            continue
        if name.endswith("running_mean"):
            t.copy_(torch.randn(t.shape, generator=gen) * 0.2)
        elif name.endswith("running_var"):
            t.copy_(torch.rand(t.shape, generator=gen) * 0.5 + 0.75)
        elif name.endswith("gamma") or name.endswith("alpha"):
            t.fill_(0.3)
        elif t.ndim == 1 and bool((t == 0).all()):
            t.copy_(torch.randn(t.shape, generator=gen) * 0.1)
