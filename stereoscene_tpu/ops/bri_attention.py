"""Confidence-reweighted spatial cross-attention (BRI core).

The reference's Bi-directional Reliable Interaction attention
(ref: projects/mmdet3d_plugin/occupancy/image2bev/attention.py:45-86) computes,
for volumes q, kv of shape [B, 1, D, H, W]:

  conf[j]   = max_d softmax_d(q)[j]                 (per-pixel confidence)
  Q = w_q q + b_q ; K = w_k kv + b_k ; V = w_v kv + b_v   (1x1x1 convs, C=1)
  E[i, j]   = sum_d Q[d, i] K[d, j]                 (HW x HW energy)
  A         = softmax_j(E) * conf[j]                (column-scaled)
  out[d, i] = sum_j V[d, j] A[i, j]
  result    = gamma * out + kv

Key observation for TPU: scaling softmax rows by conf per *column* commutes
with the value contraction, so this is standard attention with value columns
pre-scaled by confidence — flash-attention friendly. The depth axis D plays
the role of the head dimension; HW is the sequence length (7680 at the active
resolution, giving a 7680x7680 energy matrix).

``confidence_attention`` streams over query chunks with ``lax.map`` so the
energy matrix never materializes at [HW, HW] f32; each chunk's softmax is
exact (full row in one pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def confidence_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v_scaled: jnp.ndarray,
    chunk: int = 1024,
) -> jnp.ndarray:
    """out[b, d, i] = sum_j softmax_j(q[b,:,i] . k[b,:,j]) v_scaled[b, d, j].

    Args:
      q: [B, D, L] query volume (projected).
      k: [B, D, L] key volume (projected).
      v_scaled: [B, D, L] value volume already multiplied by the per-column
        confidence.
      chunk: query-chunk size; L must not be required to divide it (padding is
        applied internally).
    Returns:
      [B, D, L] attended volume, dtype of v_scaled.
    """
    b, d, length = q.shape
    out_dtype = v_scaled.dtype

    pad = (-length) % chunk
    q_p = jnp.pad(q, ((0, 0), (0, 0), (0, pad)))
    n_chunks = (length + pad) // chunk
    # [B, n_chunks, D, chunk]
    q_chunks = q_p.reshape(b, d, n_chunks, chunk).transpose(0, 2, 1, 3)

    def one_chunk(args):
        qc, kk, vv = args  # [D, chunk], [D, L], [D, L]
        energy = jnp.einsum(
            "di,dj->ij", qc, kk, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(energy.astype(jnp.float32), axis=-1)
        return jnp.einsum(
            "dj,ij->di", vv, attn.astype(vv.dtype),
            preferred_element_type=jnp.float32,
        )

    def per_batch(qcs, kk, vv):
        outs = jax.lax.map(lambda qc: one_chunk((qc, kk, vv)), qcs)
        # [n_chunks, D, chunk] -> [D, n_chunks * chunk]
        return outs.transpose(1, 0, 2).reshape(d, n_chunks * chunk)

    out = jax.vmap(per_batch)(q_chunks, k, v_scaled)
    return out[:, :, :length].astype(out_dtype)
