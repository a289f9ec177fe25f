#!/usr/bin/env python
"""Training-step throughput at flagship shapes (VERDICT round-2 item 4).

Times the FULL jitted train step — forward + losses + backward + AdamW —
at the reference's scored training workload (b7, 384x1280 stereo, D=112,
grid 128x128x16, bf16 compute with fp32 master params, remat as the config
sets it) for the requested batch sizes, and reports step/sec, frames/sec,
and model FLOPs utilization (fwd+bwd ~= 3x the 3.93 TFLOP/frame analytic
forward from BASELINE.md; v5e bf16 peak 197 TF/s).

Usage: python tools/bench_train.py [--batches 1,2] [--iters 5] [--with-cp]
Prints one JSON line per batch size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

FWD_TFLOP_PER_FRAME = 3.93
V5E_BF16_TFLOPS = 197.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--with-cp", action="store_true", default=True,
                   help="remat the backbone blocks (training default)")
    p.add_argument("--no-with-cp", dest="with_cp", action="store_false")
    p.add_argument("--bev-cp", action="store_true",
                   help="also remat the voxel-side stack (bev_with_cp) -- "
                        "needed for B=2 to fit HBM (B=2 with backbone-only "
                        "remat: OOM 18.02G/15.75G, measured round 3)")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient accumulation steps (optax.MultiSteps); "
                        "each timed iteration is ONE microbatch step, so "
                        "frames/sec stays comparable with --accum 1")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import make_flagship_batch
    from stereoscene_tpu.engine.train import (
        LossConfig, create_train_state, make_train_step,
    )
    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig

    cfg = DetectorConfig(backbone_with_cp=args.with_cp,
                         bev_with_cp=args.bev_cp)
    model = BEVDepthOccupancy(cfg=cfg)

    for b in [int(x) for x in args.batches.split(",")]:
        batch = make_flagship_batch(cfg, b)
        rng_np = np.random.RandomState(1)
        x, y, z = cfg.grid_shape
        batch["gt_occ"] = jnp.asarray(
            rng_np.randint(0, 20, (b, 2 * x, 2 * y, 2 * z))
        )
        h, w = cfg.input_size
        batch["gt_depth"] = jnp.asarray(
            (rng_np.rand(b, 2, h, w) < 0.05).astype(np.float32) * 20.0
        )

        # host shape-filled variables (bench.py pattern), fp32 masters
        shapes = jax.eval_shape(
            lambda k: model.init(k, batch, train=True), jax.random.PRNGKey(0)
        )
        host_rng = np.random.RandomState(0)

        def fill(path, leaf):
            name = "/".join(str(p) for p in path).lower()
            shape = leaf.shape
            if leaf.dtype == jnp.uint32:
                return np.zeros(shape, np.uint32)
            if "scale" in name or "var" in name:
                arr = np.ones(shape, np.float32)
            elif "bias" in name or "mean" in name or "gamma" in name:
                arr = np.zeros(shape, np.float32)
            else:
                fan_in = int(np.prod(shape[:-1])) or 1
                arr = host_rng.randn(*shape).astype(np.float32) / np.sqrt(
                    fan_in)
            return arr

        variables = jax.tree_util.tree_map_with_path(fill, shapes)
        variables = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a), variables),
            jax.devices()[0],
        )
        jax.block_until_ready(variables)

        state = create_train_state(model, variables, steps_per_epoch=100,
                                   accumulate_steps=args.accum)
        train_step = make_train_step(
            model,
            LossConfig(downsample=cfg.downsample, dbound=cfg.dbound),
            bf16=True,
        )
        jitted = jax.jit(train_step, donate_argnums=(0,))

        t0 = time.time()
        state, logs = jitted(state, batch, jax.random.PRNGKey(0))
        jax.block_until_ready(logs["loss_total"])
        print(f"# B={b} compiled+first step: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)

        # warm-up then chained steady-state (state threads through, final
        # host fetch closes the chain)
        for i in range(2):
            state, logs = jitted(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(1), i))
        _ = float(logs["loss_total"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, logs = jitted(state, batch, jax.random.fold_in(
                jax.random.PRNGKey(2), i))
        loss = float(logs["loss_total"])
        dt = (time.perf_counter() - t0) / args.iters

        tflop = 3.0 * FWD_TFLOP_PER_FRAME * b
        mfu = tflop / dt / V5E_BF16_TFLOPS
        print(json.dumps({
            "metric": "train_step", "batch": b,
            "step_ms": round(dt * 1000, 1),
            "steps_per_sec": round(1.0 / dt, 3),
            "frames_per_sec": round(b / dt, 3),
            "mfu": round(mfu, 4),
            "loss": round(loss, 4),
            "with_cp": args.with_cp,
            "bev_cp": args.bev_cp,
            "accum": args.accum,
        }), flush=True)


if __name__ == "__main__":
    main()
