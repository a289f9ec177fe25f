"""Group-wise correlation cost volume + disparity-to-depth warp.

Rebuild of the GwcNet-style stereo volume construction
(ref: ViewTransformerLSSVoxel.py:97-156):

- ``build_gwc_volume`` in the reference is a 112-iteration Python loop of
  shifted elementwise products (ref :104-114). Here it is one batched gather
  along the width axis followed by a grouped mean — a single fused
  VPU-friendly XLA computation with no Python loop.
- ``warp`` in the reference resamples the disparity axis to the depth axis
  with ``grid_sample`` over a degenerate grid (ref :128-156). That reduces
  exactly to 1-D linear interpolation along the disparity axis at positions
  ``calib / (4 k)`` with zero padding outside the valid range
  (``align_corners=True`` + zero-padded sampling), implemented here as two
  gathers and a lerp.
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def groupwise_correlation_volume(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int,
    num_groups: int,
) -> jnp.ndarray:
    """Group-wise correlation volume over integer disparities.

    vol[b, i, h, w, g] = mean_c left[b, h, w, g*cpg + c] *
                                right[b, h, w - i, g*cpg + c],
    zero where w - i < 0. (ref: ViewTransformerLSSVoxel.py:97-114)

    Args:
      left / right: [B, H, W, C] matching features (channels-last).
      max_disp: number of disparity planes D.
      num_groups: correlation groups G (C % G == 0).
    Returns:
      [B, D, H, W, G] correlation volume (input dtype).
    """
    b, h, w, c = left.shape
    assert c % num_groups == 0
    cpg = c // num_groups
    dt = left.dtype

    disp = jnp.arange(max_disp)[:, None]  # [D, 1]
    cols = jnp.arange(w)[None, :]  # [1, W]
    src = cols - disp  # [D, W]
    valid = (src >= 0).astype(dt)  # [D, W]
    src = jnp.clip(src, 0, w - 1)

    # Gather/multiply/mean in the [B, H, D, W, C] layout so the big
    # (D-major) relayout happens on the group-reduced volume (C/cpg times
    # smaller) and in the input dtype, not f32 — the HBM traffic of this op
    # dominates its cost on TPU (PERF.md).
    if os.environ.get("STEREOSCENE_GWC_HMAJOR", "1") != "1":
        right_shift = jnp.take(right, src.reshape(-1), axis=2)
        right_shift = right_shift.reshape(
            b, h, max_disp, w, c).transpose(0, 2, 1, 3, 4)
        prod = left[:, None].astype(jnp.float32) * right_shift.astype(
            jnp.float32)
        prod = prod.reshape(b, max_disp, h, w, num_groups, cpg)
        vol = jnp.mean(prod, axis=-1)
        return (vol * valid[None, :, None, :, None]).astype(dt)

    # Products and the per-group mean accumulate in f32 (matches the
    # reference's fp32 correlation under AMP); only the group-reduced
    # volume — C/cpg times smaller — is cast back to the input dtype, so
    # the dominant HBM write stays in dt.
    right_shift = jnp.take(right, src.reshape(-1), axis=2)
    right_shift = right_shift.reshape(b, h, max_disp, w, c)
    prod = left[:, :, None].astype(jnp.float32) * right_shift.astype(
        jnp.float32)
    prod = prod.reshape(b, h, max_disp, w, num_groups, cpg)
    vol = jnp.mean(prod, axis=-1) * valid[None, None, :, :, None].astype(
        jnp.float32)
    return vol.astype(dt).transpose(0, 2, 1, 3, 4)


def disparity_warp_matrix(positions: jnp.ndarray, num_disp: int):
    """The depth warp as an explicit [B, K, D] lerp matrix.

    ``warp_disparity_to_depth`` is linear in the volume, so it is exactly
    M @ vol with M[b, k, d] = w0*(d == i0) + w1*(d == i1) (grid_sample
    zero padding, align_corners=True). Contracting over D on the MXU also
    absorbs the H-major -> D-major relayout of the correlation volume that
    the gather formulation needs as a separate transpose.
    """
    pos = positions.astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = i0 + 1
    w1 = pos - i0.astype(jnp.float32)
    w0 = 1.0 - w1
    w0 = w0 * ((i0 >= 0) & (i0 <= num_disp - 1)).astype(jnp.float32)
    w1 = w1 * ((i1 >= 0) & (i1 <= num_disp - 1)).astype(jnp.float32)
    d = jnp.arange(num_disp)[None, None, :]
    return (w0[..., None] * (d == i0[..., None])
            + w1[..., None] * (d == i1[..., None]))


def gwc_warp_matmul(
    left: jnp.ndarray,
    right: jnp.ndarray,
    positions: jnp.ndarray,
    max_disp: int,
    num_groups: int,
    out_dtype=None,
) -> jnp.ndarray:
    """Correlation volume + depth warp with the warp as one MXU matmul.

    Equivalent to ``groupwise_correlation_volume`` (H-major internal
    layout) followed by ``warp_disparity_to_depth``; the gather + transpose
    pair is replaced by a [K, D] contraction (see disparity_warp_matrix).
    Returns [B, K, H, W, G] in ``out_dtype`` (default: input dtype).
    """
    b, h, w, c = left.shape
    assert c % num_groups == 0
    cpg = c // num_groups
    dt = out_dtype or left.dtype

    disp = jnp.arange(max_disp)[:, None]
    cols = jnp.arange(w)[None, :]
    src = cols - disp
    valid = (src >= 0).astype(jnp.float32)
    src = jnp.clip(src, 0, w - 1)

    right_shift = jnp.take(right, src.reshape(-1), axis=2)
    right_shift = right_shift.reshape(b, h, max_disp, w, c)
    prod = left[:, :, None].astype(jnp.float32) * right_shift.astype(
        jnp.float32)
    prod = prod.reshape(b, h, max_disp, w, num_groups, cpg)
    vol = jnp.mean(prod, axis=-1) * valid[None, None, :, :, None]
    mat = disparity_warp_matrix(positions, max_disp)
    out = jnp.einsum(
        "bkd,bhdwg->bkhwg", mat.astype(dt), vol.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.astype(dt)


def warp_disparity_to_depth(
    volume: jnp.ndarray, positions: jnp.ndarray
) -> jnp.ndarray:
    """Linearly resample the disparity axis at per-sample fractional positions.

    out[b, k] = lerp(volume[b], positions[b, k]) with zero contribution from
    indices outside [0, D-1] (grid_sample zero padding, align_corners=True).
    ref: ViewTransformerLSSVoxel.py:128-156

    Args:
      volume: [B, D, H, W, G] disparity-indexed volume.
      positions: [B, K] fractional disparity positions per output depth bin
        (see geometry.disparity_positions).
    Returns:
      [B, K, H, W, G] depth-indexed volume.
    """
    num_disp = volume.shape[1]
    pos = positions.astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = i0 + 1
    w1 = pos - i0.astype(jnp.float32)
    w0 = 1.0 - w1

    in0 = ((i0 >= 0) & (i0 <= num_disp - 1)).astype(jnp.float32)
    in1 = ((i1 >= 0) & (i1 <= num_disp - 1)).astype(jnp.float32)
    i0c = jnp.clip(i0, 0, num_disp - 1)
    i1c = jnp.clip(i1, 0, num_disp - 1)

    g0 = jnp.take_along_axis(volume, i0c[:, :, None, None, None], axis=1)
    g1 = jnp.take_along_axis(volume, i1c[:, :, None, None, None], axis=1)
    w0 = (w0 * in0)[:, :, None, None, None]
    w1 = (w1 * in1)[:, :, None, None, None]
    return g0 * w0 + g1 * w1
