"""Pallas 3x3x3 stride-1 conv3d for the hourglass cost-volume stack.

XLA's direct NDHWC conv3d at the stereo hourglass shapes (32-128 channels,
ref ViewTransformerLSSVoxel.py:70-96) runs at ~11 TF/s on v5e: the 5D
spatial tiling leaves the MXU contraction at C_in and the output lanes at
C_out, both far below 128. This kernel rebuilds the conv as im2col matmuls
entirely in VMEM:

  - grid over (output depth slice, H block); the 3-depth-slice halo block
    is DMA'd from a host-padded input held in HBM memory space (Pallas
    BlockSpecs cannot express overlapping halos),
  - per depth tap kd the 9 (kh, kw) shifted views are stored into an
    im2col VMEM scratch at static 128-aligned lane offsets (Mosaic cannot
    concat lane blocks whose sources carry different sublane offsets),
    giving one [BH*W, 9*CL] x [9*CL, Co] MXU dot per kd,
  - f32 accumulation, single write of the output block.

The kernel is exact tap algebra (cross-correlation, zero padding) — parity
vs jax.lax.conv_general_dilated asserted in tests/test_pallas_conv3d.py.
Backward recomputes through the plain conv3d VJP in an f32 island (same
custom_vjp structure as models/layers._make_zpack_op; the Pallas forward
is inference-path only).

Status (PERF.md round 3): wins isolated microbenches over XLA's conv3d at
the hourglass shapes, but measured *slower in-graph* (chained hourglass
probe +1.6 ms) — the op-boundary relayouts eat the MXU win — so the
ConvNd dispatch keeps XLA by default; STEREOSCENE_PALLAS_CONV3D=1 opts in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(d, h, w, ci, budget_bytes=6 * 1024 * 1024):
    """Largest H block whose halo input + im2col lhs + f32 acc fit VMEM."""
    wa = -(-(w + 2) // 8) * 8
    cl = -(-ci // 128) * 128  # channels padded to the lane tile
    for bh in range(h, 0, -1):
        if h % bh:
            continue
        blk = 3 * (bh + 2) * wa * cl * 2
        lhs = bh * w * 9 * cl * 2
        acc = bh * w * 128 * 4
        if blk + lhs + acc <= budget_bytes:
            return bh
    return 1


def _kernel(xp_ref, w_ref, out_ref, xblk, lhs, sem, *, bh, w, cl, co):
    d = pl.program_id(0)
    hb = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_ref.at[pl.ds(d, 3), pl.ds(hb * bh, bh + 2)], xblk, sem
    )
    cp.start()
    cp.wait()
    acc = jnp.zeros((bh * w, co), jnp.float32)
    for kd in range(3):
        # im2col into scratch: Mosaic cannot concat lane blocks whose
        # sources carry different sublane offsets (the kw shifts), but
        # full-lane-width stores at static 128-aligned offsets lower fine
        for kh in range(3):
            a = xblk[kd, kh:kh + bh]  # [BH, W+2, CL]
            for kw in range(3):
                c0 = (kh * 3 + kw) * cl
                lhs[:, c0:c0 + cl] = a[:, kw:kw + w].reshape(bh * w, cl)
        acc = acc + jnp.dot(
            lhs[:], w_ref[kd], preferred_element_type=jnp.float32
        )
    out_ref[0] = acc.reshape(bh, w, co).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3d_s1_single(x, w, interpret=False):
    """x: [D, H, W, Ci], w: [3, 3, 3, Ci, Co] -> [D, H, W, Co]."""
    d, h, wd0, ci = x.shape
    co = w.shape[-1]
    # compute on W rounded up to the 16-row bf16 sublane tile: a W extent
    # off the tile makes every im2col store a misaligned relayout
    # (measured 30x slower at W=40); the pad columns convolve zeros and
    # are sliced off at the end
    wd = -(-wd0 // 16) * 16
    bh = _pick_bh(d, h, wd, ci)
    # W halo-padded so the DMA'd slice extent is 8-sublane aligned;
    # channels padded to the 128-lane tile (Mosaic DMA slices must be
    # tile-aligned; the zero lanes multiply zero weight rows, costing MXU
    # passes but no correctness — worth it down to Ci=64, measured)
    wa = -(-(wd + 2) // 8) * 8
    cl = -(-ci // 128) * 128
    xp = jnp.pad(x, ((1, 1), (1, 1), (1, wa - wd0 - 1), (0, cl - ci)))
    # [kd, kh, kw, ci, co] -> pad ci -> [kd, (kh kw cl), co]; (kh, kw)
    # major matches the im2col scratch's lane-block order in the kernel
    w2 = jnp.pad(w, ((0, 0),) * 3 + ((0, cl - ci), (0, 0)))
    w2 = w2.reshape(3, 9 * cl, co).astype(x.dtype)
    kern = functools.partial(_kernel, bh=bh, w=wd, cl=cl, co=co)
    y = pl.pallas_call(
        kern,
        grid=(d, h // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (3, 9 * cl, co), lambda dd, hh: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, bh, wd, co), lambda dd, hh: (dd, hh, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, wd, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, bh + 2, wa, cl), x.dtype),
            pltpu.VMEM((bh * wd, 9 * cl), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, w2)
    return y[:, :, :wd0] if wd != wd0 else y


def _plain_conv3d_s1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_s1_pallas(x, w, interpret=False):
    """Exact 3x3x3 stride-1 pad-1 conv3d, batched NDHWC.

    Args:
      x: [B, D, H, W, Ci].
      w: [3, 3, 3, Ci, Co].
    Returns:
      [B, D, H, W, Co] in x.dtype (f32 accumulation inside).
    """
    ys = [
        _conv3d_s1_single(x[b], w.astype(x.dtype), interpret)
        for b in range(x.shape[0])
    ]
    return jnp.stack(ys, axis=0)


def _fwd(x, w, interpret=False):
    return conv3d_s1_pallas(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    x, w, g = jax.lax.optimization_barrier((x, w, g))

    def conv_f32(xx, ww):
        return jax.lax.conv_general_dilated(
            xx.astype(jnp.float32), ww.astype(jnp.float32),
            window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    _, vjp = jax.vjp(conv_f32, x, w)
    dx, dw = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3d_s1_pallas.defvjp(_fwd, _bwd)
