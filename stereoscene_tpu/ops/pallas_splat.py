"""Pallas TPU kernel for the LSS voxel splat.

Replaces the CUDA ``bev_pool`` scatter (ref: ViewTransformerLSSVoxel.py:473)
with a TPU-native formulation: points are sorted by voxel rank (XLA radix
sort), per-output-tile point ranges are precomputed with ``searchsorted``,
and the kernel turns each tile's scatter into a sequence of small one-hot
matmuls on the MXU:

    out_tile[T, C] += onehot(local_rank)[T, CHUNK] @ values[CHUNK, C]

so the data-dependent scatter becomes dense systolic work. The sorted value
rows are gathered from tiny source tables (depth_prob has D*fH*fW scalars,
features fH*fW rows), so the unsorted lifted volume never materializes.

Backward pass: d(values_sorted) = out_grad[ranks_sorted] — one gather —
wired as a custom VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile of output voxels per grid step; chunk of sorted points per MXU matmul.
TILE = 512
CHUNK = 1024


def _splat_kernel(starts_ref, ranks_hbm, vals_hbm, out_ref, vals_vmem,
                  ranks_vmem, sem_v, sem_r):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    out_ref[:] = jnp.zeros_like(out_ref)

    # Chunk reads are aligned down to CHUNK boundaries (Mosaic requires
    # provably tile-aligned dynamic DMA offsets). Over-read rows belong to
    # neighboring tiles, so their local rank falls outside [0, TILE) and the
    # one-hot excludes them — no masking needed.
    first_chunk = start // CHUNK
    n_chunks = (end + CHUNK - 1) // CHUNK - first_chunk

    def body(i, _):
        off = pl.multiple_of((first_chunk + i) * CHUNK, CHUNK)
        cp_v = pltpu.make_async_copy(
            vals_hbm.at[pl.ds(off, CHUNK)], vals_vmem, sem_v
        )
        cp_r = pltpu.make_async_copy(
            ranks_hbm.at[pl.ds(off, CHUNK)], ranks_vmem, sem_r
        )
        cp_v.start()
        cp_r.start()
        cp_v.wait()
        cp_r.wait()

        local = ranks_vmem[:].reshape(1, CHUNK) - t * TILE
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 0)
        onehot = (rows == local).astype(jnp.float32)
        # padded rows carry sentinel ranks >= num_voxels -> onehot all-false
        out_ref[:] += jax.lax.dot(
            onehot, vals_vmem[:].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def _splat_sorted_impl(vals_sorted, ranks_sorted, starts, num_voxels,
                       interpret=False):
    num_tiles = num_voxels // TILE
    c = vals_sorted.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # ranks in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # vals in HBM
        ],
        out_specs=pl.BlockSpec(
            (TILE, c), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, c), vals_sorted.dtype),
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _splat_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_voxels, c), jnp.float32),
        interpret=interpret,
    )(starts, ranks_sorted, vals_sorted)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _splat_sorted(vals_sorted, ranks_sorted, num_voxels, interpret):
    starts = jnp.searchsorted(
        ranks_sorted, jnp.arange(0, num_voxels + TILE, TILE, dtype=jnp.int32)
    ).astype(jnp.int32)
    return _splat_sorted_impl(vals_sorted, ranks_sorted, starts, num_voxels,
                              interpret)


def _splat_fwd(vals_sorted, ranks_sorted, num_voxels, interpret):
    out = _splat_sorted(vals_sorted, ranks_sorted, num_voxels, interpret)
    return out, ranks_sorted


def _splat_bwd(num_voxels, interpret, ranks_sorted, g):
    padded = jnp.concatenate(
        [g, jnp.zeros((1, g.shape[-1]), g.dtype)], axis=0
    )
    idx = jnp.minimum(ranks_sorted, num_voxels)
    d_vals = padded[idx]
    return d_vals, None


_splat_sorted.defvjp(_splat_fwd, _splat_bwd)


def pallas_lift_splat(
    depth_prob: jnp.ndarray,
    img_feat: jnp.ndarray,
    ranks: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused lift + Pallas splat.

    Args:
      depth_prob: [B, D, fH, fW] fused depth distribution.
      img_feat: [B, fH, fW, C] context features.
      ranks: [B, D * fH * fW] linear voxel ranks (sentinel = num_voxels).
      grid_shape: (X, Y, Z); X*Y*Z must be a multiple of TILE.
    Returns:
      [B, X, Y, Z, C] pooled features (float32).
    """
    nx, ny, nz = grid_shape
    num_voxels = nx * ny * nz
    assert num_voxels % TILE == 0, (grid_shape, TILE)
    b, d, fh, fw = depth_prob.shape
    c = img_feat.shape[-1]
    p = d * fh * fw
    pad = (-p) % CHUNK + CHUNK  # headroom so chunk DMAs never run off the end

    def one(dp, feat, rk):
        order = jnp.argsort(rk)
        rk_sorted = rk[order]
        # gather lifted rows from the small source tables
        pix = order % (fh * fw)
        vals = dp.reshape(-1)[order, None].astype(jnp.float32) * (
            feat.reshape(-1, c)[pix].astype(jnp.float32)
        )
        rk_sorted = jnp.concatenate(
            [rk_sorted, jnp.full((pad,), num_voxels + TILE, jnp.int32)]
        )
        vals = jnp.concatenate([vals, jnp.zeros((pad, c), vals.dtype)])
        out = _splat_sorted(vals, rk_sorted, num_voxels, interpret)
        return out.reshape(nx, ny, nz, c)

    return jax.vmap(one)(depth_prob, img_feat, ranks)
