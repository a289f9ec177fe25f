"""Camera-aware monocular depth net (the BEVDepth branch).

Rebuild of the reference ``DepthNet``
(ref: ViewTransformerLSSBEVDepth.py:457-517): GN(2)-normalized camera
embedding, SE-conditioned context and depth paths, depth path =
3 x ResNet BasicBlock -> ASPP (dilations 1/6/12/18 + GAP branch,
ref :343-414) -> deformable conv (mmcv DCN, groups 4, ref :490-498) ->
1x1 to D depth logits. Output is the channel concat [depth_logits | context].

TPU adaptations: channels-last, DCN realized as the gather-based
``ops.deform_conv2d`` with a zero-initialized offset head (so at init the
layer behaves exactly like a regular 3x3 conv, matching mmcv's
DeformConv2dPack init), and fp32 normalization islands.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import deform_conv2d
from .layers import BatchNorm, Conv2d, GroupNorm, Mlp, SELayer


class _TapMatmulDilatedConv(nn.Module):
    """3x3 dilated conv lowered as 9 shifted [B*H*W, Ci] x [Ci, Co] matmuls.

    XLA lowers large-dilation convs through space-to-batch, which fragments
    the spatial extent into d^2 tiny convs (~54 TF/s measured on the ASPP
    branches, PERF.md); nine full-size MXU matmuls over shifted views of the
    same padded input run at dense-matmul efficiency. Exact tap algebra
    (pad-and-slice is the conv's own window walk); param tree matches
    nn.Conv (['kernel'] of [3, 3, Ci, Co], no bias).
    """

    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, ci, self.features),
        )
        d = self.dilation
        b, h, w, _ = x.shape
        kern = kernel.astype(x.dtype)
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        out = None
        for i in range(3):
            for j in range(3):
                sl = xp[:, i * d:i * d + h, j * d:j * d + w, :]
                y = jnp.einsum(
                    "bhwc,co->bhwo", sl, kern[i, j],
                    preferred_element_type=jnp.float32,
                )
                out = y if out is None else out + y
        return out.astype(x.dtype)


class BasicBlock2d(nn.Module):
    """mmdet ResNet BasicBlock: 3x3-norm-ReLU-3x3-norm + residual.

    ``norm='gn'`` gives the SemKITTIDepthNet variant
    (ref: semkitti_depthnet.py:201-204, BasicBlock(norm_cfg=GN))."""

    features: int
    norm: str = "bn"
    norm_groups: int = 2

    def _norm(self, name):
        if self.norm == "gn":
            return GroupNorm(num_groups=self.norm_groups, name=name)
        return BatchNorm(name=name)

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = Conv2d(self.features, 3, padding=1, use_bias=False, name="conv1")(x)
        n1 = self._norm("bn1")
        y = n1(y, train=train) if self.norm == "bn" else n1(y)
        y = nn.relu(y)
        y = Conv2d(self.features, 3, padding=1, use_bias=False, name="conv2")(y)
        n2 = self._norm("bn2")
        y = n2(y, train=train) if self.norm == "bn" else n2(y)
        return nn.relu(y + residual)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (ref: ViewTransformerLSSBEVDepth.py:343-414).

    Branches: 1x1, three 3x3 atrous convs (d=6/12/18) each with BN+ReLU, and
    a global-average-pool branch with GN(2)+ReLU, upsampled (constant map, so
    plain broadcast); concat -> 1x1 -> BN -> ReLU -> dropout(0.5).
    """

    mid_channels: int
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        tapmm = os.environ.get("STEREOSCENE_ASPP_TAPMM", "1") == "1"
        outs = []
        for i, (k, d) in enumerate([(1, 1), (3, 6), (3, 12), (3, 18)]):
            pad = 0 if k == 1 else d
            if k == 3 and tapmm:
                # shifted-matmul lowering of the dilated branches (same
                # param tree — see _TapMatmulDilatedConv)
                y = _TapMatmulDilatedConv(
                    self.mid_channels, dilation=d, name=f"aspp{i + 1}_conv"
                )(x)
            else:
                y = nn.Conv(
                    self.mid_channels, (k, k), padding=[(pad, pad)] * 2,
                    kernel_dilation=(d, d), use_bias=False,
                    name=f"aspp{i + 1}_conv",
                )(x)
            y = BatchNorm(name=f"aspp{i + 1}_bn")(y, train=train)
            outs.append(nn.relu(y))

        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        g = Conv2d(self.mid_channels, 1, use_bias=False, name="gap_conv")(
            pooled.astype(x.dtype)
        )
        g = GroupNorm(num_groups=2, name="gap_gn")(g)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, outs[0].shape)
        outs.append(g)

        y = jnp.concatenate(outs, axis=-1)
        y = Conv2d(self.mid_channels, 1, use_bias=False, name="out_conv")(y)
        y = BatchNorm(name="out_bn")(y, train=train)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y


class DeformConvPack(nn.Module):
    """DCNv1 with internal zero-init offset conv (mmcv DeformConv2dPack)."""

    features: int
    groups: int = 4

    @nn.compact
    def __call__(self, x):
        # zero-initialized offset head: at init the DCN equals a plain 3x3
        # conv (mmcv DeformConv2dPack convention)
        offsets = nn.Conv(
            18, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset",
        )(x)
        cin = x.shape[-1]
        weights = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (9, cin // self.groups, self.features),
            jnp.float32,
        )
        # no bias: mmcv DeformConv2d (type 'DCN' -> DeformConv2dPack) has
        # bias=False, so reference checkpoints carry no bias tensor
        return deform_conv2d(x, offsets, weights.astype(x.dtype), None,
                             groups=self.groups)


class DepthAggregation(nn.Module):
    """Optional lifted-volume refinement net (ref:
    ViewTransformerLSSBEVDepth.py:519-574, ``use_voxel_net`` path): the
    lifted [*, C, W, D] slices are refined by a small residual conv stack in
    fp32. Off in the scored config."""

    mid_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [N, W, D, C] slices of the lifted volume
        y = Conv2d(self.mid_channels, 3, padding=1, use_bias=False,
                   name="reduce_conv")(x)
        y = BatchNorm(name="reduce_bn")(y, train=train)
        y = nn.relu(y)
        short_cut = y
        for i in range(2):
            y = Conv2d(self.mid_channels, 3, padding=1, use_bias=False,
                       name=f"conv{i}")(y)
            y = BatchNorm(name=f"bn{i}")(y, train=train)
            y = nn.relu(y)
        y = y + short_cut
        return Conv2d(self.out_channels, 3, padding=1, name="out_conv")(y)


class DepthNet(nn.Module):
    """[B*N, H, W, Cin] + [B*N, cam_channels] -> [B*N, H, W, D + C_ctx].

    ``norm_mlp=False, block_norm='gn'`` reproduces the reference's
    ``SemKITTIDepthNet`` variant exactly (semkitti_depthnet.py:171-233:
    raw camera embedding — the GN is commented out there — and GN
    BasicBlocks); the defaults are the BEVDepth ``DepthNet``."""

    mid_channels: int
    context_channels: int
    depth_channels: int
    cam_channels: int = 27
    norm_mlp: bool = True
    block_norm: str = "bn"

    @nn.compact
    def __call__(self, x, mlp_input, train: bool = False):
        mlp_input = mlp_input.reshape(-1, mlp_input.shape[-1])
        if self.norm_mlp:
            # camera embedding normalization: GN(2) over the raw vector
            # (ref: ViewTransformerLSSBEVDepth.py:479)
            mlp_input = GroupNorm(num_groups=2, name="bn")(mlp_input)

        y = Conv2d(self.mid_channels, 3, padding=1, name="reduce_conv")(x)
        y = GroupNorm(num_groups=2, name="reduce_gn")(y)
        y = nn.relu(y)

        context_se = Mlp(self.mid_channels, self.mid_channels,
                         name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, name="context_se")(y, context_se)
        context = Conv2d(self.context_channels, 1, name="context_conv")(context)

        depth_se = Mlp(self.mid_channels, self.mid_channels,
                       name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, name="depth_se")(y, depth_se)
        for i in range(3):
            depth = BasicBlock2d(
                self.mid_channels, norm=self.block_norm, name=f"block{i}"
            )(depth, train=train)
        depth = ASPP(self.mid_channels, name="aspp")(depth, train=train)
        depth = DeformConvPack(self.mid_channels, name="dcn")(depth)
        depth = Conv2d(self.depth_channels, 1, name="depth_pred")(depth)

        return jnp.concatenate([depth, context], axis=-1)
