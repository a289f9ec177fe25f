#!/usr/bin/env python
"""View-stage roofline: what does 61 ms of view stage even permit? (r4 v5)

Compiles the three bench stage programs and reads XLA's own cost analysis
(flops + bytes accessed) for each, then prints the two hardware floors per
stage on v5e (bf16 peak 197 TF/s, HBM ~819 GB/s):

    flops_floor_ms = flops / 197e12
    bytes_floor_ms = bytes / 819e9

and the measured steady-state stage time next to them. A stage whose
measured time sits near max(floors) is at the hardware wall for ITS OWN
program — remaining headroom is program-shape (fewer bytes/flops), not
scheduling. Bytes counts are XLA's analyzed HBM traffic for the optimized
HLO (relayout copies included), so "bytes_floor" is the floor of the
*compiled* program, not of the math.

Usage: python tools/probe_view_roofline.py [--iters 20] [--measure]
(--measure also times the stages; default prints floors only, which does
not need exclusive chip time.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--measure", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_flagship_batch
    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.resize import resize_trilinear
    from stereoscene_tpu.ops.splat_plan import SplatPlanCache

    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    batch = make_flagship_batch(cfg, 1)
    geo_keys = ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
    planned = SplatPlanCache(model, int(np.prod(cfg.grid_shape))).attach(
        {k: np.asarray(batch[k]) for k in geo_keys}
    )
    for k in ("splat_order", "splat_ranks", "splat_bounds"):
        batch[k] = jnp.asarray(planned[k])

    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    host_rng = np.random.RandomState(0)

    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        if leaf.dtype == jnp.uint32:
            return np.zeros(leaf.shape, np.uint32)
        if "scale" in name or "var" in name:
            return np.ones(leaf.shape, np.float32)
        if "bias" in name or "mean" in name or "gamma" in name:
            return np.zeros(leaf.shape, np.float32)
        fan_in = int(np.prod(leaf.shape[:-1])) or 1
        return host_rng.randn(*leaf.shape).astype(np.float32) / np.sqrt(
            fan_in)

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    variables = jax.device_put(
        jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if x.dtype == np.float32 else jnp.asarray(x), variables,
        ),
        jax.devices()[0],
    )
    jax.block_until_ready(variables)

    @jax.jit
    def stage_images(v, imgs):
        return model.apply(v, imgs, method="encode_images")

    @jax.jit
    def stage_view(v, fl, fr, b):
        return model.apply(v, fl, fr, b, method="view_transform")

    @jax.jit
    def stage_bev(v, voxel_feat):
        head_out, _ = model.apply(v, voxel_feat, method="bev_encode")
        logits = head_out["output_voxels"][0].astype(jnp.float32)
        logits = resize_trilinear(logits, (256, 256, 32))
        return jnp.argmax(logits, axis=-1)

    fl_s, fr_s = jax.eval_shape(stage_images, variables, batch["imgs"])
    fl = jnp.zeros(fl_s.shape, fl_s.dtype)
    fr = jnp.zeros(fr_s.shape, fr_s.dtype)
    vf_s, _ = jax.eval_shape(stage_view, variables, fl, fr, batch)
    vf = jnp.zeros(vf_s.shape, vf_s.dtype)

    rows = []
    for name, fn, a in (
        ("images", stage_images, (variables, batch["imgs"])),
        ("view", stage_view, (variables, fl, fr, batch)),
        ("bev", stage_bev, (variables, vf)),
    ):
        ca = fn.lower(*a).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byt = float(ca.get("bytes accessed", 0.0))
        rows.append({
            "stage": name,
            "tflops": round(flops / 1e12, 3),
            "gbytes": round(byt / 1e9, 3),
            "flops_floor_ms": round(flops / V5E_BF16_TFLOPS / 1e9, 2),
            "bytes_floor_ms": round(byt / V5E_HBM_GBS / 1e6, 2),
        })

    if args.measure:
        def timeit(fn, make_args, reduce_out, iters):
            def loop(n):
                feedback = 0.0
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(*make_args(feedback))
                    feedback = reduce_out(out) * 0
                _ = float(feedback)
                return (time.perf_counter() - t0) / n * 1000

            loop(5)
            return loop(iters)

        imgs0 = batch["imgs"]
        t_img = timeit(
            stage_images,
            lambda fb: (variables, imgs0 + jnp.asarray(fb, imgs0.dtype)),
            lambda out: jnp.max(jnp.abs(out[0].astype(jnp.float32))),
            args.iters,
        )
        flr, frr = stage_images(variables, imgs0)
        t_view = timeit(
            stage_view,
            lambda fb: (variables, flr + jnp.asarray(fb, flr.dtype), frr,
                        batch),
            lambda out: jnp.max(jnp.abs(out[0].astype(jnp.float32))),
            args.iters,
        )
        vfr, _ = stage_view(variables, flr, frr, batch)
        t_bev = timeit(
            stage_bev,
            lambda fb: (variables, vfr + jnp.asarray(fb, vfr.dtype)),
            lambda out: jnp.max(out).astype(jnp.float32),
            args.iters,
        )
        for row, t in zip(rows, (t_img, t_view, t_bev)):
            row["measured_ms"] = round(t, 2)
            floor = max(row["flops_floor_ms"], row["bytes_floor_ms"])
            row["x_over_floor"] = round(t / floor, 2) if floor else None

    for row in rows:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
