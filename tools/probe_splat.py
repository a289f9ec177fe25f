#!/usr/bin/env python
"""On-chip probe: splat variants with REAL frustum ranks (bench calib).

Variants:
  scatter          — current production (XLA scatter-add, in-graph ranks)
  sorted-dev       — device argsort + segment_sum
  static-seg       — host-precomputed order/ranks + XLA gather + segment_sum
  static-seg-cmp   — same, compacted to valid points only
  static-pallas    — host order + XLA gather + pallas one-hot kernel
  static-pallas-cmp— compacted variant
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from tools.probe_view import timeit, dispatch_overhead
from bench import make_flagship_batch
from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig

CHUNK = 1024
TILE = 512


def main():
    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    batch = make_flagship_batch(cfg, 1)
    nx, ny, nz = cfg.grid_shape
    nvox = nx * ny * nz
    D, fH, fW, C = cfg.num_depth, *cfg.feature_size, cfg.numC_Trans
    P = D * fH * fW

    ranks = np.asarray(
        jax.jit(lambda b: model.apply({}, b, method="compute_ranks"))(batch)
    )[0]
    valid = ranks < nvox
    print(f"# P={P}, valid={valid.sum()} ({100 * valid.mean():.1f}%)",
          flush=True)
    print(f"# dispatch overhead {dispatch_overhead():.2f} ms", flush=True)

    rng = np.random.RandomState(0)
    dp = jnp.asarray(rng.rand(1, D, fH, fW), jnp.float32)
    feat = jnp.asarray(rng.randn(1, fH, fW, C), jnp.float32)
    ranks_j = jnp.asarray(ranks[None])

    from stereoscene_tpu.ops.voxel_pool import lift_splat

    t = timeit(lambda d: lift_splat(d, feat, ranks_j, cfg.grid_shape), dp)
    print(f"scatter (prod): {t:.2f} ms", flush=True)

    t = timeit(
        lambda d: lift_splat(d, feat, ranks_j, cfg.grid_shape,
                             method="sorted"), dp)
    print(f"sorted-dev (argsort+segsum): {t:.2f} ms", flush=True)

    # ---- static plans (host precompute) ----
    def plan(compact):
        order = np.argsort(ranks, kind="stable").astype(np.int32)
        rs = ranks[order]
        if compact:
            keep = rs < nvox
            order, rs = order[keep], rs[keep]
        pad = (-len(order)) % CHUNK + CHUNK
        order = np.concatenate([order, np.zeros(pad, np.int32)])
        rs = np.concatenate(
            [rs, np.full(pad, nvox + TILE, np.int32)])
        return jnp.asarray(order), jnp.asarray(rs)

    for compact in (False, True):
        order, rs = plan(compact)
        n = order.shape[0]
        tag = "cmp" if compact else "all"
        print(f"# plan[{tag}]: {n} points", flush=True)

        def gather_vals(d, order=order):
            dpf = d.reshape(-1)
            ff = feat.reshape(-1, C)
            return dpf[order, None] * ff[order % (fH * fW)]

        def static_seg(d, order=order, rs=rs):
            vals = gather_vals(d, order)
            out = jax.ops.segment_sum(
                vals, jnp.minimum(rs, nvox), num_segments=nvox + 1,
                indices_are_sorted=True)
            return out[:nvox]

        t = timeit(static_seg, dp)
        print(f"static-seg[{tag}]: {t:.2f} ms", flush=True)

        from stereoscene_tpu.ops.pallas_splat import _splat_sorted

        def static_pallas(d, order=order, rs=rs):
            vals = gather_vals(d, order)
            return _splat_sorted(vals, rs, nvox, False)

        t = timeit(static_pallas, dp)
        print(f"static-pallas[{tag}]: {t:.2f} ms", flush=True)

        t = timeit(lambda d: gather_vals(d).sum(axis=0), dp)
        print(f"  gather-only[{tag}]: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
