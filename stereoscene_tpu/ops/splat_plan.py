"""Host-side static splat plans: the SURVEY §7 'static-rank insight'.

With image augmentation off and BDA identity (the scored inference
configuration), the frustum->voxel index map depends only on the calibration
matrices — constant per KITTI sequence. The argsort and the
out-of-bounds compaction can therefore be hoisted out of the compiled step
entirely (ref CUDA bev_pool re-sorts every call,
ViewTransformerLSSVoxel.py:432-476): the plan below is built once per
calibration on the host CPU and shipped with the batch as two int32 arrays.

Measured on the v5e (tools/probe_splat.py, real bench-calib ranks,
43.8% of frustum points in-bounds):

    scatter (in-graph ranks, production default)  11.6 ms
    static plan + gather + pallas one-hot kernel   2.8 ms

Plan layout (per sample):
  order:        [P_pad] int32 — in-bounds points, sorted by voxel rank,
                padded with 0 (any valid index; pad rows are masked by rank).
  ranks_sorted: [P_pad] int32 — ranks in sorted order; padding carries the
                sentinel num_voxels + TILE so the one-hot kernel and the
                segment-sum fallback both drop those rows.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from .pallas_splat import CHUNK, TILE


def compute_ranks_host(model, sample: Dict[str, np.ndarray]) -> np.ndarray:
    """Frustum voxel ranks for one sample, computed on the host CPU backend
    (never dispatches to the TPU; safe inside data-loading threads).

    ``sample`` needs rots/trans/intrins/post_rots/post_trans/bda with a
    leading batch dim of 1."""
    import jax

    cpu = jax.local_devices(backend="cpu")[0]
    fn = jax.jit(lambda b: model.apply({}, b, method="compute_ranks"))
    batch = {
        k: jax.device_put(np.asarray(sample[k]), cpu)
        for k in ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
    }
    return np.asarray(fn(batch))[0]


def build_plan(
    ranks: np.ndarray,
    num_voxels: int,
    p_pad: Optional[int] = None,
    group: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """ranks [P] -> (order [P_pad], ranks_sorted [P_pad]).

    When ``p_pad`` is None the plan is sized to this frame's in-bounds count
    rounded up to a CHUNK multiple (+1 CHUNK of DMA headroom). Pass a fixed
    ``p_pad`` to share one compiled graph across calibrations.

    ``group > 1`` pads every voxel's run of points to a multiple of
    ``group`` (pad rows carry ``order = len(ranks)`` — an out-of-range
    sentinel the device masks to zero weight — and the segment's own rank),
    so no group of ``group`` consecutive rows straddles a voxel boundary.
    The device can then pre-reduce groups densely and scatter ``group``x
    fewer rows (see ops/voxel_pool.lift_splat_static)."""
    if group < 1:
        raise ValueError(f"splat group must be >= 1, got {group}")
    if group > 1 and CHUNK % group != 0:
        # plan budgets are CHUNK-aligned; a non-divisor group would make
        # P_pad % group != 0 and fail the device-side [-1, group, c] reshape
        # with an opaque trace error (ops/voxel_pool.py grouped branch)
        raise ValueError(
            f"splat group {group} must divide the plan chunk size {CHUNK} "
            f"so padded plans stay group-aligned"
        )
    if p_pad is not None and p_pad % group != 0:
        raise ValueError(
            f"p_pad={p_pad} is not a multiple of splat group {group}; the "
            f"grouped device path reshapes the plan to [-1, {group}, C]"
        )
    p_total = len(ranks)
    order = np.argsort(ranks, kind="stable").astype(np.int32)
    rs = ranks[order]
    keep = rs < num_voxels
    order, rs = order[keep], rs[keep]
    if group > 1 and len(order):
        uniq, counts = np.unique(rs, return_counts=True)
        padded = (counts + group - 1) // group * group
        offsets = np.cumsum(padded) - padded
        seg_start = np.cumsum(counts) - counts
        seg_id = np.repeat(np.arange(len(uniq)), counts)
        pos = offsets[seg_id] + (np.arange(len(order)) - seg_start[seg_id])
        total = int(padded.sum())
        new_order = np.full(total, p_total, np.int32)
        new_rs = np.repeat(uniq, padded).astype(np.int32)
        new_order[pos] = order
        order, rs = new_order, new_rs
    n = len(order)
    if p_pad is None:
        p_pad = plan_budget(n)
    if n > p_pad:
        raise ValueError(
            f"splat plan budget too small: {n} in-bounds points > p_pad="
            f"{p_pad}; rebuild loaders with a larger budget"
        )
    pad = p_pad - n
    order = np.concatenate(
        [order, np.full(pad, p_total if group > 1 else 0, np.int32)]
    )
    rs = np.concatenate([rs, np.full(pad, num_voxels + TILE, np.int32)])
    if group > 1:
        validate_plan_group(rs, group)
    return order, rs


def plan_bounds(
    ranks_sorted: np.ndarray, num_voxels: int, group: int = 1
) -> np.ndarray:
    """Segment boundaries of a sorted plan over its (pre-reduced) rows.

    Returns [num_voxels + 1] int32 with rows [bounds[v], bounds[v+1]) of the
    group-pre-reduced value array belonging to voxel v (pad-sentinel rows
    fall past bounds[num_voxels]). Feeds the scatter-free device reduction
    ``voxel_pool.segment_sum_bounds`` — the boundaries are static per
    calibration, so the device never scatters (SURVEY §7 static-rank
    insight taken one step further than the sorted segment-sum)."""
    rs_pre = np.asarray(ranks_sorted)[::group]
    return np.searchsorted(
        rs_pre, np.arange(num_voxels + 1), side="left"
    ).astype(np.int32)


def validate_plan_group(ranks_sorted: np.ndarray, group: int) -> None:
    """Assert no ``group``-row block of a plan straddles a voxel boundary.

    The grouped device path (ops/voxel_pool.lift_splat_static) sums each
    block densely and scatters one row per block under the block's first
    rank — silently wrong voxel sums if the plan was built with a different
    ``group``. Cheap host-side check; call it on any plan whose producer is
    not ``build_plan(group=...)`` itself."""
    if group <= 1:
        return
    if len(ranks_sorted) % group != 0:
        raise ValueError(
            f"plan length {len(ranks_sorted)} not a multiple of group {group}"
        )
    blocks = np.asarray(ranks_sorted).reshape(-1, group)
    bad = np.nonzero((blocks != blocks[:, :1]).any(axis=1))[0]
    if len(bad):
        raise ValueError(
            f"splat plan is not group-{group} aligned: {len(bad)} blocks "
            f"straddle voxel boundaries (first at rows "
            f"{bad[0] * group}..{bad[0] * group + group - 1}); rebuild the "
            f"plan with build_plan(..., group={group})"
        )


def plan_budget(n_valid: int, margin: float = 1.1) -> int:
    """Fixed plan size for a dataset: measured in-bounds count x margin,
    rounded up to a CHUNK multiple, +1 CHUNK of DMA headroom (KITTI calibs
    differ by <1% across sequences, so 10% margin is generous)."""
    n = int(n_valid * margin)
    return (n + CHUNK - 1) // CHUNK * CHUNK + CHUNK


class SplatPlanCache:
    """Per-calibration plan cache for eval/inference loaders.

    ``attach(batch)`` computes (or reuses) the plan of every sample in a
    numpy batch and adds 'splat_order'/'splat_ranks' arrays. The first plan
    fixes the shared p_pad budget."""

    def __init__(self, model, num_voxels: int, group: Optional[int] = None):
        cfg_group = getattr(getattr(model, "cfg", None), "splat_group", None)
        if group is None:
            group = 1 if cfg_group is None else cfg_group
        elif cfg_group is not None and int(group) != int(cfg_group):
            # the device path reduces plans with the STATIC cfg.splat_group;
            # a cache built with a different group would produce silently
            # wrong voxel sums (grouped blocks straddling voxel boundaries)
            raise ValueError(
                f"SplatPlanCache group={group} conflicts with the model's "
                f"cfg.splat_group={cfg_group}; the compiled splat uses the "
                f"cfg value, so the plan must be built with the same group"
            )
        self.model = model
        self.num_voxels = num_voxels
        self.group = int(group)
        self.p_pad: Optional[int] = None
        self._cache: Dict[
            bytes, Tuple[np.ndarray, np.ndarray, np.ndarray]
        ] = {}

    def _key(self, sample_i: Dict[str, np.ndarray]) -> bytes:
        return b"".join(
            np.ascontiguousarray(sample_i[k]).tobytes()
            for k in ("rots", "trans", "intrins", "post_rots", "post_trans",
                      "bda")
        )

    def attach(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        b = np.asarray(batch["rots"]).shape[0]
        orders, rankss, boundss = [], [], []
        for i in range(b):
            sample = {
                k: np.asarray(batch[k])[i : i + 1]
                for k in ("rots", "trans", "intrins", "post_rots",
                          "post_trans", "bda")
            }
            key = self._key({k: v[0] for k, v in sample.items()})
            hit = self._cache.get(key)
            if hit is None:
                ranks = compute_ranks_host(self.model, sample)
                if self.p_pad is None:
                    # size the shared budget from the first frame's own
                    # group-padded plan (alignment growth included)
                    first = build_plan(
                        ranks, self.num_voxels, group=self.group
                    )
                    self.p_pad = len(first[0])
                order, rs = build_plan(
                    ranks, self.num_voxels, self.p_pad, group=self.group
                )
                hit = (
                    order, rs,
                    plan_bounds(rs, self.num_voxels, group=self.group),
                )
                self._cache[key] = hit
            orders.append(hit[0])
            rankss.append(hit[1])
            boundss.append(hit[2])
        out = dict(batch)
        out["splat_order"] = np.stack(orders)
        out["splat_ranks"] = np.stack(rankss)
        out["splat_bounds"] = np.stack(boundss)
        return out

    def wrap(self, loader):
        """Wrap a loader so every batch carries its splat plan. Preserves
        len()/batch_size for the eval harness."""
        return _PlannedLoader(self, loader)


class _PlannedLoader:
    def __init__(self, cache: "SplatPlanCache", loader):
        self._cache = cache
        self._loader = loader
        self.batch_size = getattr(loader, "batch_size", None)

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        for batch in self._loader:
            yield self._cache.attach(batch)
