"""Voxel pooling (the LSS "splat") for TPU.

The reference calls the CUDA ``mmdet3d.ops.bev_pool`` extension
(ref: ViewTransformerLSSVoxel.py:432-476) or the pure-torch
sort + ``QuickCumsum`` fallback (ref: ViewTransformerLSSBEVDepth.py:33-68,
184-197). Both are a masked scatter-sum of B*D*fH*fW lifted frustum points
into the X*Y*Z voxel grid.

TPU-native formulations here:

- ``voxel_pool_scatter``: one XLA scatter-add. Out-of-bounds points carry the
  sentinel rank ``num_voxels`` and land in a dropped overflow bucket.
  Differentiable (scatter-add transposes to gather).
- ``voxel_pool_sorted``: sort-by-rank + ``jax.ops.segment_sum`` — the
  QuickCumsum-equivalent algorithm, kept as a parity oracle and as the fast
  path when XLA's sorted segment reduction wins.

Both operate on flattened ``[P, C]`` features + ``[P]`` int ranks so the same
kernels serve bev_pool, the BEVDepth-style ``voxel_pooling`` alternate
(ref: ViewTransformerLSSBEVDepth.py:272-282), and any future sparse variant.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def segment_sum_bounds(vals, rk, bounds, num_voxels):
    """Sorted segment-sum as cumsum + static-boundary gather-diff.

    TPU scatter (what ``segment_sum`` lowers to) is the slowest primitive in
    the splat; with a host-built static plan the segment boundaries are data,
    not control, so the whole reduction becomes scatter-free:

        out[v] = cs[bounds[v+1]] - cs[bounds[v]],  cs = exclusive-cumsum(vals)

    and the backward is a pure gather: dvals[i] = dout[rk[i]] (zero for the
    pad sentinel). Both directions are gathers — no scatter in forward OR
    backward, unlike ``segment_sum`` whose transpose is a gather but whose
    forward is a scatter.

    Precision: cumsum-then-difference cancels; with fp32 cumsum the absolute
    error is ~eps * |running sum| ~ 1e-4 at bench shapes — far below the
    bf16 cast of the consumer (tests/test_splat_plan.py checks 1e-3).

    Args:
      vals: [P, C] fp32 sorted per-point features (pad rows zero-weighted).
      rk: [P] int32 sorted ranks (pad sentinel >= num_voxels); used only by
        the backward gather.
      bounds: [num_voxels + 1] int32 host-precomputed row boundaries
        (``splat_plan.plan_bounds``): rows [bounds[v], bounds[v+1]) belong
        to voxel v.
    Returns:
      [num_voxels, C] summed features.
    """
    cs = jnp.cumsum(vals, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    gb = jnp.take(cs, bounds, axis=0)
    return gb[1:] - gb[:-1]


def _ssb_fwd(vals, rk, bounds, num_voxels):
    cs = jnp.cumsum(vals, axis=0)
    cs = jnp.concatenate([jnp.zeros_like(cs[:1]), cs], axis=0)
    gb = jnp.take(cs, bounds, axis=0)
    return gb[1:] - gb[:-1], (rk, bounds.shape)


def _ssb_bwd(num_voxels, res, dout):
    rk, bshape = res
    dpad = jnp.concatenate([dout, jnp.zeros_like(dout[:1])], axis=0)
    dvals = jnp.take(dpad, jnp.minimum(rk, num_voxels), axis=0)
    return (
        dvals,
        np.zeros(rk.shape, jax.dtypes.float0),
        np.zeros(bshape, jax.dtypes.float0),
    )


segment_sum_bounds.defvjp(_ssb_fwd, _ssb_bwd)


def voxel_pool_scatter(
    feats: jnp.ndarray, ranks: jnp.ndarray, num_voxels: int
) -> jnp.ndarray:
    """Scatter-add pooled features.

    Args:
      feats: [P, C] per-point features.
      ranks: [P] int32 linear voxel index in [0, num_voxels]; the value
        ``num_voxels`` is an overflow bucket for out-of-bounds points.
    Returns:
      [num_voxels, C] summed features.
    """
    out = jnp.zeros((num_voxels + 1, feats.shape[-1]), dtype=feats.dtype)
    out = out.at[ranks].add(feats, mode="drop")
    return out[:num_voxels]


def voxel_pool_sorted(
    feats: jnp.ndarray, ranks: jnp.ndarray, num_voxels: int
) -> jnp.ndarray:
    """Sort + segment-sum pooling (QuickCumsum-equivalent algorithm)."""
    order = jnp.argsort(ranks)
    sorted_feats = feats[order]
    sorted_ranks = ranks[order]
    out = jax.ops.segment_sum(
        sorted_feats,
        sorted_ranks,
        num_segments=num_voxels + 1,
        indices_are_sorted=True,
    )
    return out[:num_voxels]


def lift_splat_static(
    depth_prob: jnp.ndarray,
    img_feat: jnp.ndarray,
    order: jnp.ndarray,
    ranks_sorted: jnp.ndarray,
    grid_shape: tuple[int, int, int],
    group: int = 1,
    bounds: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Fused lift + splat over a host-precomputed static plan
    (ops/splat_plan.py): points arrive pre-sorted by voxel rank and compacted
    to the in-bounds set, so the argsort and ~56% of the gather/reduce work
    never enter the compiled step (SURVEY §7 static-rank insight; 2.8 ms vs
    the 11.6 ms in-graph scatter on the v5e, tools/probe_splat.py).

    On TPU the reduction is the Pallas sorted one-hot-matmul kernel
    (ops/pallas_splat.py); elsewhere a sorted segment-sum computes the
    identical result (used by the CPU test suite).

    Args:
      depth_prob: [B, D, fH, fW].
      img_feat: [B, fH, fW, C].
      order: [B, P_pad] int32 sorted in-bounds point indices. Pad rows carry
        0 for group=1 plans and the out-of-range sentinel ``D*fH*fW`` for
        grouped plans (masked to zero weight on device).
      ranks_sorted: [B, P_pad] int32 sorted ranks (pad sentinel
        >= num_voxels).
      group: group alignment the plan was built with
        (``splat_plan.build_plan(group=...)``). MUST match the plan — a
        group-1 plan run with group>1 sums across voxel boundaries
        (``splat_plan.validate_plan_group`` is the host-side check).
        The ``STEREOSCENE_STATIC_SPLAT=pallas`` knob applies only to
        group=1 plans; grouped plans always use the sorted segment-sum
        (their pre-reduced row count is no longer CHUNK-aligned, which the
        Pallas kernel's DMA tiling requires).
      bounds: optional [B, num_voxels + 1] int32 host-precomputed segment
        boundaries over the (group-pre-reduced) plan rows
        (``splat_plan.plan_bounds``). When present, the reduction is the
        scatter-free cumsum + boundary gather-diff (``segment_sum_bounds``)
        unless ``STEREOSCENE_STATIC_SPLAT`` forces another backend.
    Returns:
      [B, X, Y, Z, C] pooled voxel features (float32).
    """
    num_x, num_y, num_z = grid_shape
    num_voxels = num_x * num_y * num_z
    b, d, fh, fw = depth_prob.shape
    c = img_feat.shape[-1]
    on_tpu = jax.default_backend() == "tpu"

    # Reduction backend: the sorted segment-sum wins INSIDE the full graph
    # (stage_view 80.6 ms vs 89 dynamic-scatter vs 110 pallas — the pallas
    # custom-call forces operand materialization/scheduling barriers that
    # cost more in-graph than its standalone 2.8 ms win; tools/probe_splat.py
    # + PERF.md). Pallas kept behind the env knob for standalone use and
    # future XLA revisits.
    import os

    backend = os.environ.get("STEREOSCENE_STATIC_SPLAT", "cumsum")
    use_pallas = on_tpu and backend == "pallas"
    use_cumsum = bounds is not None and backend == "cumsum"

    def one(dp, feat, od, rk, bd):
        if group > 1:
            # group-aligned plan (ops/splat_plan.py build_plan(group=G)):
            # every G consecutive rows share a voxel, pad rows carry the
            # out-of-range order sentinel. Dense G-way pre-reduce (fuses
            # with the gather), then a G-x smaller sorted segment-sum.
            p_total = d * fh * fw
            odc = jnp.minimum(od, p_total - 1)
            w = (od < p_total).astype(jnp.float32)
            vals = (dp.reshape(-1)[odc].astype(jnp.float32) * w)[:, None] * (
                feat.reshape(-1, c)[odc % (fh * fw)].astype(jnp.float32)
            )
            vals = vals.reshape(-1, group, c).sum(axis=1)
            if use_cumsum:
                out = segment_sum_bounds(vals, rk[::group], bd, num_voxels)
            else:
                out = jax.ops.segment_sum(
                    vals, jnp.minimum(rk[::group], num_voxels),
                    num_segments=num_voxels + 1, indices_are_sorted=True,
                )[:num_voxels]
            return out.reshape(num_x, num_y, num_z, c)
        vals = dp.reshape(-1)[od, None].astype(jnp.float32) * (
            feat.reshape(-1, c)[od % (fh * fw)].astype(jnp.float32)
        )
        if use_cumsum:
            out = segment_sum_bounds(vals, rk, bd, num_voxels)
        elif use_pallas:
            from .pallas_splat import _splat_sorted

            out = _splat_sorted(vals, rk, num_voxels, False)
        else:
            out = jax.ops.segment_sum(
                vals, jnp.minimum(rk, num_voxels),
                num_segments=num_voxels + 1, indices_are_sorted=True,
            )[:num_voxels]
        return out.reshape(num_x, num_y, num_z, c)

    # static python loop over the (small) batch: vmap of a pallas_call
    # lowers poorly on this backend (serializing wrapper), and the per-sample
    # kernels pipeline fine as independent calls
    return jnp.stack(
        [one(depth_prob[i], img_feat[i], order[i], ranks_sorted[i],
             None if bounds is None else bounds[i])
         for i in range(b)]
    )


def lift_splat(
    depth_prob: jnp.ndarray,
    img_feat: jnp.ndarray,
    ranks: jnp.ndarray,
    grid_shape: tuple[int, int, int],
    method: str = "scatter",
) -> jnp.ndarray:
    """Fused lift (outer product) + splat (voxel pooling) for one batch of
    cameras.

    The reference materializes the full [B, N, D, fH, fW, C] lifted volume
    before pooling (ref: ViewTransformerLSSVoxel.py:517-523). Here the lift is
    expressed per-sample and immediately consumed by the pooling reduction so
    XLA can fuse the outer product into the scatter operand.

    Args:
      depth_prob: [B, D, fH, fW] fused depth distribution.
      img_feat: [B, fH, fW, C] context features (single lifted camera).
      ranks: [B, D*fH*fW] linear voxel ranks (sentinel = num_voxels).
      grid_shape: (X, Y, Z).
    Returns:
      [B, X, Y, Z, C] pooled voxel features.
    """
    num_x, num_y, num_z = grid_shape
    num_voxels = num_x * num_y * num_z
    b, d, fh, fw = depth_prob.shape
    c = img_feat.shape[-1]

    pool = voxel_pool_scatter if method == "scatter" else voxel_pool_sorted

    def one(dp, feat, rk):
        lifted = dp.reshape(d, fh, fw, 1) * feat.reshape(1, fh, fw, c)
        return pool(lifted.reshape(-1, c), rk, num_voxels)

    pooled = jax.vmap(one)(depth_prob, img_feat, ranks)
    return pooled.reshape(b, num_x, num_y, num_z, c)
