"""VoVNet(V2) image backbone (alternate; ref: models/backbones/vovnet.py).

One-shot aggregation (OSA) blocks: a chain of 3x3 convs whose outputs are all
concatenated and fused by a 1x1 conv, with optional identity residual and
eSE channel attention — the V2 variant the reference vendors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv2d


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv2d(
            self.features, self.kernel, stride=self.stride,
            padding=self.kernel // 2, use_bias=False, name="conv",
        )(x)
        x = BatchNorm(name="bn")(x, train=train)
        return nn.relu(x)


class ESE(nn.Module):
    """Effective squeeze-excite (single fc, hard-sigmoid-free V2 form)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        gate = nn.Dense(self.channels, name="fc")(pooled.astype(x.dtype))
        return x * nn.sigmoid(gate)[:, None, None, :]


class OSABlock(nn.Module):
    stage_channels: int
    concat_channels: int
    num_convs: int = 5
    identity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        feats = [x]
        y = x
        for i in range(self.num_convs):
            y = ConvBN(self.stage_channels, name=f"conv{i}")(y, train=train)
            feats.append(y)
        y = jnp.concatenate(feats, axis=-1)
        y = ConvBN(self.concat_channels, kernel=1, name="concat_conv")(
            y, train=train
        )
        y = ESE(self.concat_channels, name="ese")(y)
        if self.identity and residual.shape == y.shape:
            y = y + residual
        return y


class VoVNet(nn.Module):
    """VoVNet-39-ish: stem /4, four OSA stages at strides 4/8/16/32."""

    stage_channels: Sequence[int] = (128, 160, 192, 224)
    concat_channels: Sequence[int] = (256, 512, 768, 1024)
    blocks_per_stage: Sequence[int] = (1, 1, 2, 2)
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBN(64, stride=2, name="stem1")(x, train=train)
        x = ConvBN(64, name="stem2")(x, train=train)
        x = ConvBN(128, stride=2, name="stem3")(x, train=train)

        outs = []
        for s, (sc, cc, n) in enumerate(
            zip(self.stage_channels, self.concat_channels,
                self.blocks_per_stage)
        ):
            if s > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
            for i in range(n):
                x = OSABlock(
                    sc, cc, identity=(i > 0), name=f"stage{s}_osa{i}"
                )(x, train=train)
            if s in self.out_indices:
                outs.append(x)
        return tuple(outs)
