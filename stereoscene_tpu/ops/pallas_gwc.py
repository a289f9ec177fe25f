"""Fused group-wise correlation + disparity->depth warp as one Pallas kernel.

The unfused pipeline (ops/gwc.py, ref ViewTransformerLSSVoxel.py:97-156)
materializes the [B, H, D, W, G] correlation volume in HBM, transposes it to
D-major, and gathers twice for the depth warp — ~5 full volume-sized HBM
round trips for an op whose math is ~8 VPU flops per output element. This
kernel reads the two 2 MB feature maps once and writes the warped 55 MB
volume once: for every output depth bin k it computes the two neighbouring
integer-disparity correlations on-chip (a dynamic W-shift of the
zero-padded right features held in VMEM) and lerps them with the
grid-sample weights.

The warp's zero-padding-outside-[0, D-1] semantics are folded into the lerp
weights on the host side (``_warp_coeffs``); the correlation's w - i < 0
validity mask falls out of the zero padding of the shifted right features.
Exactness vs the unfused pair is asserted by tests/test_pallas_gwc.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_TILE = 8


def _warp_coeffs(positions: jnp.ndarray, num_disp: int):
    """grid_sample(align_corners, zeros) lerp indices/weights. positions is
    [B, K] fractional disparity; returns i0 [B, K] int32 and w0/w1 [B, K]
    f32 with out-of-range contributions zeroed and i0 clipped so i0 and
    i0 + 1 are always in-bounds."""
    pos = positions.astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = i0 + 1
    w1 = pos - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    w0 = w0 * ((i0 >= 0) & (i0 <= num_disp - 1)).astype(jnp.float32)
    w1 = w1 * ((i1 >= 0) & (i1 <= num_disp - 1)).astype(jnp.float32)
    # i0 in [-1, D-1] keeps the in-range corner addressable in both boundary
    # cells (i0 = -1: only corner i1 = 0 live; i0 = D-1: only corner i0
    # live); outside that range both weights are already zero, so clipping
    # just keeps the kernel's W-shift in bounds
    i0c = jnp.clip(i0, -1, num_disp - 1)
    return i0c, w0, w1


def _kernel(i0_ref, w0_ref, w1_ref, left_ref, rightp_ref, out_ref,
            *, max_disp, cpg, k_tile):
    wt = pl.program_id(1)
    kt = pl.program_id(2)
    w, _, h, g = left_ref.shape
    # Layout notes (all driven by Mosaic lowering restrictions):
    # - inputs arrive channel-deinterleaved as [W(pad), cpg, H, G]: the
    #   group mean is a sum over the small axis-1 (the lane dim cannot be
    #   split by an in-kernel reshape), and the dynamically shifted W axis
    #   leads so the shift is a plain untiled-offset ref load (dynamic
    #   starts on the tiled sublane/lane dims do not lower).
    # - rightp along W: max_disp leading zeros | right | 1 trailing zero,
    #   so original column j sits at padded row max_disp + j and every
    #   slice below is in bounds for i0 in [-1, max_disp - 1]
    left = left_ref[:].astype(jnp.float32)

    def one_k(j, _):
        k = kt * k_tile + j
        i0 = i0_ref[k]
        w0 = w0_ref[k]
        w1 = w1_ref[k]
        # rows w' - i0 - 1 .. w' - i0 + (Wt-1) for w' = wt*Wt: both lerp
        # corners in one dynamic-start load (rightp_ref spans the full
        # padded W; left/out blocks span only this program's W tile)
        sl = rightp_ref[
            pl.ds(wt * w + max_disp - i0 - 1, w + 1)
        ].astype(jnp.float32)
        acc0 = jnp.sum(left * sl[1:], axis=1)   # disparity i0
        acc1 = jnp.sum(left * sl[:w], axis=1)   # disparity i0 + 1
        corr = acc0 * (w0 / cpg) + acc1 * (w1 / cpg)
        out_ref[j] = corr.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, k_tile, one_k, 0)


def _largest_divisor_leq(n, cap):
    for v in range(min(n, cap), 0, -1):
        if n % v == 0:
            return v
    return 1


def _fused_one(left, rightp, i0, w0, w1, *, max_disp, num_out, num_groups,
               cpg, out_dtype, interpret):
    h, w, c = left.shape
    # lane packing: G alone underfills the 128 VPU lanes (G=32 pads 4x in
    # VMEM, which blew the scoped-VMEM budget); fold `pack` H-rows into the
    # lane dim so the kernel works on [W, cpg, H/pack, pack*G] tiles
    pack = 1
    for p in (4, 2):
        if h % p == 0 and p * num_groups <= 128:
            pack = p
            break
    hp = h // pack

    def relayout(x):
        # [H, W, C] -> [W, cpg, H/pack, pack*G]; channel g*cpg + c of row
        # h = hq*pack + hr lands at [w', c, hq, hr*G + g]
        xw = jnp.stack([x[..., ci::cpg] for ci in range(cpg)], axis=0)
        xw = xw.transpose(2, 0, 1, 3)  # [W, cpg, H, G]
        ww = xw.shape[0]
        xw = xw.reshape(ww, cpg, hp, pack * num_groups)
        return xw

    left_d = relayout(left)
    rightp_d = relayout(rightp)
    k_tile = K_TILE if num_out % K_TILE == 0 else 1
    # block along W (the leading dim): the f32 slices + accumulators +
    # double-buffered out blocks must stay inside the 16 MB scoped-VMEM
    # budget at flagship shapes. Only this program's W tile of left/out is
    # needed; the dynamic disparity shift reads from the full padded
    # rightp, which stays resident whole (constant index map).
    w_tile = _largest_divisor_leq(w, 32)
    wp = rightp_d.shape[0]
    lanes = pack * num_groups
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1, w // w_tile, num_out // k_tile),
        in_specs=[
            pl.BlockSpec((w_tile, cpg, hp, lanes),
                         lambda b, wt, kt, *_: (wt, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wp, cpg, hp, lanes),
                         lambda b, wt, kt, *_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_tile, w_tile, hp, lanes),
            lambda b, wt, kt, *_: (kt, wt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, max_disp=max_disp, cpg=cpg, k_tile=k_tile
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_out, w, hp, lanes), out_dtype
        ),
        interpret=interpret,
    )(i0, w0, w1, left_d, rightp_d)
    # [K, W, H/pack, pack*G] -> [K, H, W, G]
    out = out.reshape(num_out, w, hp, pack, num_groups)
    return out.transpose(0, 2, 3, 1, 4).reshape(num_out, h, w, num_groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def fused_gwc_warp(
    left: jnp.ndarray,
    right: jnp.ndarray,
    positions: jnp.ndarray,
    max_disp: int,
    num_groups: int,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused equivalent of ``groupwise_correlation_volume`` followed by
    ``warp_disparity_to_depth`` (ops/gwc.py).

    Args:
      left / right: [B, H, W, C] matching features (channels-last).
      positions: [B, K] fractional disparity positions per output depth bin.
      max_disp: number of disparity planes D of the implicit volume.
      num_groups: correlation groups G (C % G == 0).
    Returns:
      [B, K, H, W, G] depth-indexed correlation volume.
    """
    b, h, w, c = left.shape
    assert c % num_groups == 0
    cpg = c // num_groups
    num_out = positions.shape[1]
    out_dtype = out_dtype or left.dtype

    i0, w0, w1 = _warp_coeffs(positions, max_disp)
    # zero pad the shift region in front (column w' - i of the original
    # right lands at padded column max_disp + w' - i; w' - i < 0 reads
    # zeros, reproducing the gwc validity mask) plus one trailing zero so
    # the i0 = -1 slice stays in bounds
    rightp = jnp.pad(right, ((0, 0), (0, 0), (max_disp, 1), (0, 0)))

    fn = functools.partial(
        _fused_one, max_disp=max_disp, num_out=num_out,
        num_groups=num_groups, cpg=cpg, out_dtype=out_dtype,
        interpret=interpret,
    )
    return jax.vmap(fn)(left, rightp, i0, w0, w1)


def _unfused(left, right, positions, max_disp, num_groups, out_dtype):
    from .gwc import groupwise_correlation_volume, warp_disparity_to_depth

    vol = groupwise_correlation_volume(left, right, max_disp, num_groups)
    return warp_disparity_to_depth(vol, positions).astype(
        out_dtype or left.dtype
    )


def _fused_fwd(left, right, positions, max_disp, num_groups, out_dtype,
               interpret):
    out = fused_gwc_warp(left, right, positions, max_disp, num_groups,
                         out_dtype, interpret)
    return out, (left, right, positions)


def _fused_bwd(max_disp, num_groups, out_dtype, interpret, res, g):
    # backward through the (XLA-fused) unfused composition — the kernel is
    # the forward's HBM-traffic optimization, the math is identical
    left, right, positions = res
    _, vjp = jax.vjp(
        lambda l, r: _unfused(l, r, positions, max_disp, num_groups,
                              out_dtype),
        left, right,
    )
    dl, dr = vjp(g)
    return dl, dr, jnp.zeros_like(positions)


fused_gwc_warp.defvjp(_fused_fwd, _fused_bwd)
