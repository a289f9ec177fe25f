"""CRP3D: context-relation-prior module over mega-voxels.

Rebuild of the MonoScene-style ``CPMegaVoxels``
(ref: occupancy/backbones/crp3d.py:173-262, hooked into CustomResNet3D at
resnet3d.py:158-165 and supervised by ``compute_super_CP_multilabel_loss``
resnet3d.py:269-290; inactive in the scored config).

Mechanism: pool the stage features onto a coarse mega-voxel grid, predict for
every (voxel, mega-voxel) pair a vector of ``n_relations`` logits, use the
sigmoid relations to aggregate mega-voxel context back into each voxel, and
return both the enriched features and the relation logits for the BCE
relation loss.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import Conv3d, GroupNorm


class CPMegaVoxels(nn.Module):
    channels: int
    mega_shape: Tuple[int, int, int] = (32, 32, 4)
    n_relations: int = 4
    norm_groups: int = 4

    @nn.compact
    def __call__(self, x):
        """x: [B, X, Y, Z, C] -> (features, relation_logits).

        relation_logits: [B, n_relations, N_voxel, N_mega]."""
        b, xs, ys, zs, c = x.shape
        mx, my, mz = self.mega_shape
        fx, fy, fz = xs // mx, ys // my, zs // mz
        n_voxel = xs * ys * zs
        n_mega = mx * my * mz

        # mega-voxel context: average-pool + 1x1 conv
        mega = x.reshape(b, mx, fx, my, fy, mz, fz, c).mean(axis=(2, 4, 6))
        mega_feat = Conv3d(self.channels, 1, name="mega_context")(mega)
        mega_flat = mega_feat.reshape(b, n_mega, self.channels)

        # per-voxel relation logits against every mega voxel
        rel = Conv3d(self.channels, 1, name="voxel_reduce")(x)
        rel = nn.relu(GroupNorm(self.norm_groups, name="voxel_gn")(rel))
        rel_flat = rel.reshape(b, n_voxel, self.channels)
        mega_key = nn.Dense(self.channels, name="mega_key")(mega_flat)

        logits = jnp.einsum(
            "bvc,bmc->bvm", rel_flat, mega_key,
            preferred_element_type=jnp.float32,
        )
        rel_head = nn.Dense(self.n_relations, name="relation_head")
        # per-pair relation scores: modulate the bilinear logit per relation
        rel_scale = rel_head(rel_flat)  # [B, V, R]
        p_logits = logits[:, None] * rel_scale.transpose(0, 2, 1)[..., None]
        # [B, R, V, M]

        # context aggregation: sigmoid-weighted sum of mega features
        weights = nn.sigmoid(p_logits.astype(jnp.float32)).mean(axis=1)
        context = jnp.einsum(
            "bvm,bmc->bvc", weights.astype(x.dtype), mega_flat,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        context = context.reshape(b, xs, ys, zs, self.channels)

        out = jnp.concatenate([x, context], axis=-1)
        out = Conv3d(c, 1, name="fuse")(out)
        return out, p_logits


def crp_relation_loss(
    p_logits: jnp.ndarray, cp_mega_matrix: jnp.ndarray
) -> jnp.ndarray:
    """Multi-label BCE with per-relation pos_weight = #neg / #pos.

    Args:
      p_logits: [B, R, V, M].
      cp_mega_matrix: [B, R, V, M] binary targets.
    ref: resnet3d.py:269-290
    """
    logits = p_logits.astype(jnp.float32).reshape(
        p_logits.shape[0], p_logits.shape[1], -1
    )
    labels = cp_mega_matrix.astype(jnp.float32).reshape(logits.shape)

    cnt_pos = jnp.sum(labels, axis=(0, 2))
    cnt_neg = jnp.sum(1.0 - labels, axis=(0, 2))
    pos_weight = cnt_neg / jnp.maximum(cnt_pos, 1.0)

    logp = jax.nn.log_sigmoid(logits)
    log1mp = jax.nn.log_sigmoid(-logits)
    per = -(
        pos_weight[None, :, None] * labels * logp + (1.0 - labels) * log1mp
    )
    return jnp.mean(per)
