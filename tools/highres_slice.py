#!/usr/bin/env python
"""Single-chip 1/N-shard slice of the high-res 512x512x64 config.

Validates that one chip's share of the spatially-sharded high-res variant
(configs/stereoscene_highres.py, BASELINE config 5) fits in HBM and measures
its step time: the image-side stack (replicated across the 'space' axis in
the real mesh) runs at full flagship shapes, while the voxel grid's X axis
is cut to 1/N — exactly the per-chip workload minus the halo exchanges.

Usage: python tools/highres_slice.py [--shards 4] [--train] [--iters 5]
Writes one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shards", type=int, default=4)
    p.add_argument("--train", action="store_true",
                   help="time the full fwd+loss+bwd+AdamW step (default: "
                        "inference forward)")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--stream-chunks", type=int, default=16,
                   help="scan-over-slabs streaming voxel loss chunks "
                        "(0 = monolithic upsample+loss, the round-3 "
                        "liveness-thrashing path); --train only")
    p.add_argument("--no-bev-cp", action="store_true",
                   help="bisect: train WITHOUT voxel-side remat")
    p.add_argument("--no-backbone-cp", action="store_true",
                   help="bisect: train WITHOUT backbone remat")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from stereoscene_tpu.config import Config
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    hr_full = DetectorConfig.from_config(
        Config.fromfile(
            os.path.join(repo, "stereoscene_tpu", "configs",
                         "stereoscene_highres.py")
        )
    )
    x, y, z = hr_full.grid_shape
    assert x % args.shards == 0
    x_slice = x // args.shards
    step_x = hr_full.xbound[2]
    cfg = dataclasses.replace(
        hr_full,
        xbound=(hr_full.xbound[0],
                hr_full.xbound[0] + step_x * x_slice, step_x),
        backbone_with_cp=args.train and not args.no_backbone_cp,
        bev_with_cp=args.train and not args.no_bev_cp,
    )
    assert cfg.grid_shape == (x_slice, y, z), cfg.grid_shape
    print(
        f"# slice: grid {cfg.grid_shape} (X 1/{args.shards} of {x}), "
        f"occ {tuple(2 * g for g in cfg.grid_shape)}, "
        f"input {cfg.input_size}, D={cfg.num_depth}",
        file=sys.stderr,
    )

    model = BEVDepthOccupancy(cfg=cfg)
    batch = _make_batch(cfg, b=1)
    # host-side shape-filled init (bench.py pattern: eager full init of the
    # b7 graph dispatches thousands of ops through the relay)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=args.train),
        jax.random.PRNGKey(0),
    )
    host_rng = np.random.RandomState(0)

    def fill(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = leaf.shape
        if leaf.dtype == jnp.uint32:
            return np.zeros(shape, np.uint32)
        if "scale" in name or "var" in name:
            arr = np.ones(shape, np.float32)
        elif "bias" in name or "mean" in name or "gamma" in name:
            arr = np.zeros(shape, np.float32)
        else:
            fan_in = int(np.prod(shape[:-1])) or 1
            arr = host_rng.randn(*shape).astype(np.float32) / np.sqrt(fan_in)
        return arr

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    dev = jax.devices()[0]
    cast = (lambda x: jnp.asarray(x, jnp.bfloat16)
            if x.dtype == np.float32 else jnp.asarray(x))
    if args.bf16 and not args.train:
        variables = jax.device_put(jax.tree.map(cast, variables), dev)
        batch = jax.device_put(jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if x.dtype == jnp.float32 else x, batch), dev)
    else:
        variables = jax.device_put(
            jax.tree.map(lambda x: jnp.asarray(x), variables), dev)
        batch = jax.device_put(batch, dev)
    jax.block_until_ready(variables)

    if args.train:
        from stereoscene_tpu.engine.train import (
            LossConfig, create_train_state, make_train_step,
        )

        state = create_train_state(model, variables, steps_per_epoch=10)
        chunks = args.stream_chunks
        if chunks > 0 and cfg.grid_shape[1] % chunks:
            chunks = max(d for d in range(1, chunks + 1)
                         if cfg.grid_shape[1] % d == 0)
        train_step = make_train_step(
            model, LossConfig(downsample=cfg.downsample, dbound=cfg.dbound,
                              stream_voxel_chunks=chunks),
            bf16=args.bf16,  # the highres config trains in bf16 compute
        )
        jitted = jax.jit(train_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(0)
        state, logs = jitted(state, batch, rng)  # compile + warm
        jax.block_until_ready(logs["loss_total"])
        # Warm until steady — load-bearing (round-5 root cause of the
        # "128-258 s/step" highres numbers): feeding back the donated-state
        # outputs changes the call's layout signature, and jax RE-LOWERS +
        # RECOMPILES the step (~374 s at these shapes, jax_log_compiles
        # shows it) — and the chosen output layouts keep moving for a few
        # executables before reaching a fixed point. Steady state after
        # convergence: ~0.7 s/step. Timing without this loop averages
        # one-off compiles into 2-5 iterations and reports a fiction
        # (round 3's "128.5 s/step" was exactly that).
        for w in range(6):
            tw = time.perf_counter()
            state, logs = jitted(state, batch, jax.random.fold_in(rng, 100 + w))
            jax.block_until_ready(logs["loss_total"])
            dtw = time.perf_counter() - tw
            print(f"# warm {w}: {dtw:.1f}s", file=sys.stderr, flush=True)
            if dtw < 5.0:
                break
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, logs = jitted(state, batch, jax.random.fold_in(rng, i))
        # chain on a host fetch so relay async can't lie
        total = float(logs["loss_total"])
        dt = (time.perf_counter() - t0) / args.iters
        mode = "train"
        try:
            compiled = jitted.lower(state, batch, rng).compile()
            ma = compiled.memory_analysis()
            stats_extra = {"hbm_stage_max_gb": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / 2**30, 3)}
            ca = compiled.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            stats_extra["analyzed_tflops"] = round(
                float(ca.get("flops", 0.0)) / 1e12, 3)
            stats_extra["analyzed_gbytes"] = round(
                float(ca.get("bytes accessed", 0.0)) / 1e9, 3)
        except Exception as e:  # noqa: BLE001
            stats_extra = {"hbm_stage_max_gb": None, "mem_err": str(e)[:80]}
    else:
        # staged forward (bench.py pattern: the single-unit flagship graph
        # is pathological through the remote-compile relay)
        @jax.jit
        def stage_images(v, imgs):
            return model.apply(v, imgs, method="encode_images")

        @jax.jit
        def stage_view(v, fl, fr, b):
            return model.apply(v, fl, fr, b, method="view_transform")

        @jax.jit
        def stage_bev(v, voxel_feat):
            head_out, _ = model.apply(v, voxel_feat, method="bev_encode")
            return jnp.argmax(
                head_out["output_voxels"][0].astype(jnp.float32), axis=-1)

        fl, fr = stage_images(variables, batch["imgs"])
        voxel_feat, _ = stage_view(variables, fl, fr, batch)
        pred = stage_bev(variables, voxel_feat)
        jax.block_until_ready(pred)

        def forward(b):
            fl, fr = stage_images(variables, b["imgs"])
            vf, _ = stage_view(variables, fl, fr, b)
            return stage_bev(variables, vf)

        imgs0 = batch["imgs"]
        feedback = jnp.zeros((), imgs0.dtype)
        for _ in range(2):  # warm-up
            b2 = dict(batch); b2["imgs"] = imgs0 + feedback
            feedback = jnp.max(forward(b2)).astype(imgs0.dtype) * 0
        _ = float(feedback)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            b2 = dict(batch); b2["imgs"] = imgs0 + feedback
            feedback = jnp.max(forward(b2)).astype(imgs0.dtype) * 0
        total = float(feedback)
        dt = (time.perf_counter() - t0) / args.iters
        mode = "forward"

        # compile-time memory analysis (device memory_stats is unsupported
        # through the relay): sum of argument + output + temp bytes of the
        # three stage executables approximates per-chip HBM demand
        try:
            mem = 0
            for fn, a in ((stage_images, (variables, batch["imgs"])),
                          (stage_view, (variables, fl, fr, batch)),
                          (stage_bev, (variables, voxel_feat))):
                ma = fn.lower(*a).compile().memory_analysis()
                mem = max(mem, ma.argument_size_in_bytes
                          + ma.output_size_in_bytes + ma.temp_size_in_bytes)
            stats_extra = {"hbm_stage_max_gb": round(mem / 2**30, 3)}
        except Exception as e:  # noqa: BLE001
            stats_extra = {"hbm_stage_max_gb": None, "mem_err": str(e)[:80]}

    stats = {}
    try:
        ms = dev.memory_stats() or {}
        stats = {
            "hbm_peak_gb": round(
                ms.get("peak_bytes_in_use", 0) / 2**30, 3),
            "hbm_in_use_gb": round(ms.get("bytes_in_use", 0) / 2**30, 3),
            "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30, 3),
        }
    except Exception:
        pass
    if "stats_extra" in dir():
        stats.update(stats_extra)
    print(json.dumps({
        "mode": mode, "shards": args.shards,
        "grid": list(cfg.grid_shape),
        "step_ms": round(dt * 1000, 1), "value": total, **stats,
    }))


if __name__ == "__main__":
    main()
