"""ViT image backbone (alternate; ref: models/backbones/vit.py in the
reference's backbone zoo, ~1760 LoC with timm loaders).

A clean TPU implementation: patchify -> pre-norm transformer blocks with
bidirectional attention -> optional multi-scale feature pyramid via
deconv/conv resampling of the final token map (the SimpleFPN pattern the
reference pairs with ViT, ref bevformer/modules/simplefpn.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvTransposeTorch


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="attn"
        )(y, y)
        x = x + y
        y = nn.LayerNorm(dtype=jnp.float32)(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class ViT(nn.Module):
    """Columnar ViT with a 4-scale output pyramid.

    out_strides map the single 1/patch feature map to strides (4, 8, 16, 32)
    via deconv/identity/conv resampling so it drops into SECONDFPN configs.
    """

    patch_size: int = 16
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    out_strides: Tuple[int, ...] = (4, 8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        tokens = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), name="patch_embed"
        )(x)
        fh, fw = tokens.shape[1:3]
        tokens = tokens.reshape(b, fh * fw, self.embed_dim)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, fh * fw, self.embed_dim),
        )
        tokens = tokens + pos.astype(tokens.dtype)
        for i in range(self.depth):
            tokens = TransformerBlock(
                self.embed_dim, self.num_heads, name=f"block{i}"
            )(tokens, train=train)
        tokens = nn.LayerNorm(dtype=jnp.float32)(tokens).astype(x.dtype)
        feat = tokens.reshape(b, fh, fw, self.embed_dim)

        outs = []
        for stride in self.out_strides:
            factor = self.patch_size // stride
            if factor > 1:
                y = ConvTransposeTorch(
                    features=self.embed_dim, kernel_size=factor, ndim=2,
                    stride=factor, name=f"up{stride}",
                )(feat)
            elif factor == 1:
                y = feat
            else:
                k = stride // self.patch_size
                y = nn.avg_pool(feat, (k, k), strides=(k, k))
            outs.append(y)
        return tuple(outs)
