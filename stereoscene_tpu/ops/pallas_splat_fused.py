"""Fully-fused Pallas LSS splat: lift + gather + scatter in one kernel.

Extends ops/pallas_splat.py by moving the lift *inside* the kernel: the
depth-probability table (D*fH*fW scalars) and the feature table (fH*fW rows)
are small enough to reside wholly in VMEM, so each point chunk gathers its
rows on-chip (tpu dynamic_gather) instead of materializing the 440MB sorted
lifted matrix in HBM. Combined with a host/XLA-precomputed static sort order
(the frustum->voxel map depends only on calibration when image augmentation
is off — SURVEY.md section 7 'static-rank insight'), the whole splat is one
kernel pass over the order array.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512
CHUNK = 1024


def _fused_kernel(starts_ref, order_hbm, ranks_hbm, dp_ref, feat_ref,
                  out_ref, ord_vmem, ranks_vmem, sem_o, sem_r):
    t = pl.program_id(0)
    start = starts_ref[t]
    end = starts_ref[t + 1]
    out_ref[:] = jnp.zeros_like(out_ref)

    hw = feat_ref.shape[0]
    first_chunk = start // CHUNK
    n_chunks = (end + CHUNK - 1) // CHUNK - first_chunk

    def body(i, _):
        off = pl.multiple_of((first_chunk + i) * CHUNK, CHUNK)
        cp_o = pltpu.make_async_copy(
            order_hbm.at[pl.ds(off, CHUNK)], ord_vmem, sem_o
        )
        cp_r = pltpu.make_async_copy(
            ranks_hbm.at[pl.ds(off, CHUNK)], ranks_vmem, sem_r
        )
        cp_o.start()
        cp_r.start()
        cp_o.wait()
        cp_r.wait()

        order = ord_vmem[:]
        pix = jnp.mod(order, hw)
        # Mosaic supports 2D gathers only; dp table is stored [P, 1]
        dp_rows = jnp.take(dp_ref[:], order, axis=0)       # [CHUNK, 1]
        feat_rows = jnp.take(feat_ref[:], pix, axis=0)     # [CHUNK, C]
        vals = dp_rows.astype(jnp.float32) * feat_rows.astype(jnp.float32)

        local = ranks_vmem[:].reshape(1, CHUNK) - t * TILE
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, CHUNK), 0)
        onehot = (rows == local).astype(jnp.float32)
        out_ref[:] += jax.lax.dot(
            onehot, vals, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)


def fused_splat_sorted(
    dp_flat: jnp.ndarray,       # [P, 1] depth probabilities (natural order)
    feat_table: jnp.ndarray,    # [fH*fW, C]
    order: jnp.ndarray,         # [P_pad] sorted point order (padded with 0)
    ranks_sorted: jnp.ndarray,  # [P_pad] ranks in sorted order (pad sentinel)
    num_voxels: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-sample fused splat. Padding rows must carry sentinel ranks
    >= num_voxels + TILE and any valid order index."""
    c = feat_table.shape[-1]
    num_tiles = num_voxels // TILE
    starts = jnp.searchsorted(
        ranks_sorted,
        jnp.arange(0, num_voxels + TILE, TILE, dtype=jnp.int32),
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # order in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # ranks in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dp table (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # feat table (whole)
        ],
        out_specs=pl.BlockSpec(
            (TILE, c), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.VMEM((CHUNK,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _fused_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_voxels, c), jnp.float32),
        interpret=interpret,
    )(starts, order, ranks_sorted, dp_flat, feat_table)


def pallas_lift_splat_fused(
    depth_prob: jnp.ndarray,
    img_feat: jnp.ndarray,
    ranks: jnp.ndarray,
    grid_shape: Tuple[int, int, int],
    order: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused splat. ``order`` ([B, P] int32) may be precomputed on
    the host (static per calibration); if None it is computed with argsort."""
    nx, ny, nz = grid_shape
    num_voxels = nx * ny * nz
    assert num_voxels % TILE == 0
    b, d, fh, fw = depth_prob.shape
    c = img_feat.shape[-1]
    p = d * fh * fw
    pad = (-p) % CHUNK + CHUNK

    if order is None:
        order = jax.vmap(jnp.argsort)(ranks)

    def one(dp, feat, rk, od):
        rk_sorted = rk[od]
        od_p = jnp.concatenate([od, jnp.zeros((pad,), jnp.int32)])
        rk_p = jnp.concatenate(
            [rk_sorted, jnp.full((pad,), num_voxels + TILE, jnp.int32)]
        )
        out = fused_splat_sorted(
            dp.reshape(-1, 1), feat.reshape(-1, c), od_p, rk_p, num_voxels,
            interpret,
        )
        return out.reshape(nx, ny, nz, c)

    return jax.vmap(one)(depth_prob, img_feat, ranks,
                         order.astype(jnp.int32))


# NOTE: this backend's Mosaic gather lowering only supports
# take_along_axis-shaped 2D gathers (input/indices/output same shape), so the
# in-kernel row gather does not compile on the current libtpu; the kernel is
# validated in interpret mode and becomes the default once dynamic_gather
# lands. ops/pallas_splat.py (sorted one-hot matmul over pre-gathered values)
# and the XLA scatter in ops/voxel_pool.py are the production paths.
