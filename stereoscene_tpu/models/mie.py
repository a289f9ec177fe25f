"""Mutual Interactive Ensemble (MIE) block — the paper's core fusion module.

Rebuild of ``volume_interaction`` + ``attention`` + ``CA3D``
(ref: ViewTransformerLSSVoxel.py:227-268, attention.py:45-120):

- **BRI** (Bi-directional Reliable Interaction): two confidence-reweighted
  spatial cross-attentions between the stereo and LSS depth distributions.
  With C=1 volumes, the reference's 1x1x1 Q/K/V convs are scalar affine maps,
  the per-pixel confidence is ``max_d softmax_d(q)``, and the column-scaled
  softmax commutes into the value term — so each direction is exact
  flash-style attention over HW tokens with depth as the head dim (see
  ops/bri_attention.py). ``gamma`` residual gates are zero-initialized
  (attention.py:54), so at init the block is the identity on ``kv``.

- **DVE** (Dual Volume Ensemble): concat of the two guided volumes ->
  conv3d(2->32) -> one 3D hourglass -> zero-init-alpha residual CA3D channel
  recalibration -> conv3d(32->1) -> fp32 softmax over depth.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops.bri_attention import confidence_attention
from .layers import Conv3d, GroupNorm, agg4d_enabled
from .stereo_volume import Hourglass3D


class BRIAttention(nn.Module):
    """One direction of the BRI cross-attention (attention.py:45-86).

    Operates on single-channel volumes [B, D, H, W]."""

    chunk: int = 1024

    @nn.compact
    def __call__(self, q, kv):
        b, d, h, w = q.shape
        # scalar affine projections (1x1x1 convs on a C=1 volume)
        wq = self.param("query_w", nn.initializers.normal(1.0), (1,))
        bq = self.param("query_b", nn.initializers.zeros, (1,))
        wk = self.param("key_w", nn.initializers.normal(1.0), (1,))
        bk = self.param("key_b", nn.initializers.zeros, (1,))
        wv = self.param("value_w", nn.initializers.normal(1.0), (1,))
        bv = self.param("value_b", nn.initializers.zeros, (1,))
        gamma = self.param("gamma", nn.initializers.zeros, (1,))

        # fp32 confidence: max over depth of softmax over depth
        conf = nn.softmax(q.astype(jnp.float32), axis=1)
        conf = jnp.max(conf, axis=1).reshape(b, h * w)  # [B, HW]

        qf = (wq * q + bq).reshape(b, d, h * w)
        kf = (wk * kv + bk).reshape(b, d, h * w)
        vf = (wv * kv + bv).reshape(b, d, h * w)
        v_scaled = vf * conf[:, None, :].astype(vf.dtype)

        out = confidence_attention(qf, kf, v_scaled, chunk=self.chunk)
        out = out.reshape(b, d, h, w)
        return gamma.astype(kv.dtype) * out + kv


class CA3D(nn.Module):
    """Channel-attention 3D recalibration (attention.py:90-120)."""

    channels: int

    @nn.compact
    def __call__(self, x):
        # x is [B, D, H, W, C], or slice-packed [D, H, W, C] in the agg4d
        # domain (models/layers.py): GN statistics must then span the depth
        # slices (one sample), and the squeeze pools over (D, H, W).
        packed = x.ndim == 4

        def gn(name, v):
            if packed:
                d, h, w, c = v.shape
                return GroupNorm(num_groups=1, name=name)(
                    v.reshape(1, d * h, w, c)
                ).reshape(d, h, w, c)
            return GroupNorm(num_groups=1, name=name)(v)

        data = Conv3d(self.channels, 3, padding=1, name="conv1")(x)
        data = nn.gelu(data, approximate=False)
        data = gn("gn1", data)

        spatial = (0, 1, 2) if packed else (1, 2, 3)
        pooled = jnp.mean(data.astype(jnp.float32), axis=spatial)
        squeeze = nn.Dense(self.channels // 8, name="fc_reduce")(
            pooled.astype(x.dtype)
        )
        squeeze = nn.gelu(squeeze, approximate=False)
        squeeze = nn.Dense(self.channels, name="fc_expand")(squeeze)
        squeeze = nn.gelu(squeeze, approximate=False)
        weight = nn.sigmoid(squeeze)
        weight = (weight[None, None, None, :] if packed
                  else weight[:, None, None, None, :])

        out = weight.astype(data.dtype) * data
        out = Conv3d(self.channels, 3, padding=1, name="conv2")(out)
        out = nn.gelu(out, approximate=False)
        return gn("gn2", out)


class VolumeInteraction(nn.Module):
    """MIE: BRI both directions + DVE fusion -> fused depth distribution.

    Input/output volumes are [B, D, H, W] (single channel).
    ref: ViewTransformerLSSVoxel.py:236-268
    """

    channels: int = 32
    attention_chunk: int = 1024
    # False when the caller wraps this module in nn.remat (lss.py with_cp):
    # the agg4d fast path is inference-only and skipped under remat
    with_cp: bool = False

    @nn.compact
    def __call__(self, stereo_volume, lss_volume, train: bool = False):
        # lss volume guided by stereo confidence, and vice versa
        lss_from_stereo = BRIAttention(
            chunk=self.attention_chunk, name="lss2stereo"
        )(q=stereo_volume, kv=lss_volume)
        stereo_from_lss = BRIAttention(
            chunk=self.attention_chunk, name="stereo2lss"
        )(q=lss_volume, kv=stereo_volume)

        both = jnp.stack([lss_from_stereo, stereo_from_lss], axis=-1)
        # agg4d: the DVE chain (redir1 -> hourglass -> CA3D -> redir2) is
        # the same B=1 conv3d regime as the stereo aggregation — run it
        # slice-packed rank-4 [D, H, W, C] so no 5D conv operand exists
        # (exact math, identical params; tests/test_agg4d.py MIE case)
        agg4d = agg4d_enabled(both.shape[0], train, self.with_cp)
        if agg4d:
            both = both[0]
        data = nn.relu(
            Conv3d(self.channels, 3, padding=1, name="redir1")(both)
        )
        data = Hourglass3D(self.channels, name="dres1")(data, train=train)

        alpha = self.param("ca3d_alpha", nn.initializers.zeros, (1,))
        data = alpha.astype(data.dtype) * CA3D(self.channels, name="ca3d")(
            data
        ) + data

        fused = nn.relu(Conv3d(1, 3, padding=1, name="redir2")(data))[..., 0]
        if agg4d:
            fused = fused[None]  # [1, D, H, W]
        return nn.softmax(fused.astype(jnp.float32), axis=1).astype(
            stereo_volume.dtype
        )
