"""SECOND-style FPN necks (2D image neck + 3D voxel neck), channels-last.

- ``SECONDFPN``: the mmdet3d built-in used as the image neck
  (config stereoscene.py:70-74): per-level resampling to a common scale —
  fractional stride 1/s -> strided conv (downsample), integer stride s ->
  transposed conv (upsample) — each followed by BN(eps 1e-3, momentum 0.01)
  + ReLU, then channel concat. For the active config the five EfficientNet
  levels (strides 4/8/16/32/32, channels [48,80,224,640,2560]) map to
  upsample_strides [0.5,1,2,4,4] -> five 128-ch maps at 1/8, concat = 640 ch.

- ``SECONDFPN3D``: the reference's 3D variant
  (ref: occupancy/necks/second_fpn_3d.py:13-117): per-level deconv3d
  (kernel = stride = upsample factor) + GroupNorm + ReLU, concat, optional
  extra output upsample block.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, ConvNd, ConvTransposeTorch, GroupNorm


class SECONDFPN(nn.Module):
    """2D multi-level resample-and-concat neck."""

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    upsample_strides: Sequence[float]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, (feat, out_ch, stride) in enumerate(
            zip(feats, self.out_channels, self.upsample_strides)
        ):
            if stride >= 1:
                s = int(stride)
                y = ConvTransposeTorch(
                    features=out_ch, kernel_size=s, ndim=2, stride=s,
                    use_bias=False, name=f"deblock{i}_deconv",
                )(feat)
            else:
                s = int(round(1.0 / stride))
                y = ConvNd(
                    features=out_ch, kernel_size=s, ndim=2, stride=s,
                    use_bias=False, name=f"deblock{i}_conv",
                )(feat)
            y = BatchNorm(
                epsilon=1e-3, torch_momentum=0.01, name=f"deblock{i}_bn"
            )(y, train=train)
            ups.append(nn.relu(y))
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]


class SECONDFPN3D(nn.Module):
    """3D multi-level upsample-and-concat neck over [B, X, Y, Z, C] grids.

    GN is deliberate: the reference notes replacing GN with BN3d drops val
    mIoU 42.5 -> 40.9 (second_fpn_3d.py:39-40).
    """

    in_channels: Sequence[int]
    out_channels: Sequence[int]
    upsample_strides: Sequence[int]
    norm_groups: int = 32
    use_output_upsample: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, (feat, out_ch, stride) in enumerate(
            zip(feats, self.out_channels, self.upsample_strides)
        ):
            s = int(stride)
            y = ConvTransposeTorch(
                features=out_ch, kernel_size=s, ndim=3, stride=s,
                use_bias=False, name=f"deblock{i}_deconv",
            )(feat)
            y = GroupNorm(num_groups=self.norm_groups, packed3d=True, name=f"deblock{i}_gn")(y)
            ups.append(nn.relu(y))
        out = jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]

        if self.use_output_upsample:
            total = sum(self.out_channels)
            out = ConvTransposeTorch(
                features=total, kernel_size=2, ndim=3, stride=2,
                use_bias=False, name="output_deconv",
            )(out)
            out = GroupNorm(num_groups=self.norm_groups, packed3d=True, name="output_gn")(out)
            out = nn.relu(out)
        return out
