"""Benchmark: SSC inference frames/sec/chip on the active StereoScene config.

Runs the flagship model (EfficientNet-b7, 384x1280 stereo input, D=112,
128x128x16 voxel grid, upsampled 256x256x32 output — the reference's scored
configuration, stereoscene.py:57-126) in bf16 on one chip and reports
steady-state frames/sec.

The forward is compiled in three stage units (image encoder / view transform
/ bev encoder+head) — the single-unit flagship graph exceeds the
remote-compile relay's request limits in this environment, and staged
compiles double as the reference's per-stage latency table
(ref bevdepth_occupancy.py:252-263). Parameters are initialized on the host
CPU backend (local compile) and transferred, avoiding a second giant device
compile for init.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` divides by the reference's derived A100 throughput, read
from the ``reference_a100_fps:`` line of BASELINE.md (see its "Reference
A100 throughput derivation" section: analytic 3.93 TFLOP/frame forward ÷
A100 TF32 peak at a stated 5% eager-torch utilization ≈ 2.0 fps; the
BASELINE.json target is >= 5x that per v5e chip, i.e. vs_baseline >= 5).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np


def reference_a100_fps() -> float:
    """Parse the derived denominator from BASELINE.md (single source of
    truth for the vs_baseline ratio)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BASELINE.md")
    try:
        with open(path) as f:
            m = re.search(r"^reference_a100_fps:\s*([0-9.]+)", f.read(),
                          re.MULTILINE)
        if m:
            return float(m.group(1))
    except OSError:
        pass
    return 2.0


ASSUMED_A100_FPS = reference_a100_fps()


def make_flagship_batch(cfg, b=1, dtype=None):
    import jax.numpy as jnp

    h, w = cfg.input_size
    rng = np.random.RandomState(0)
    eye3 = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 2, 3, 3))
    intrin = np.zeros((b, 2, 3, 4), np.float32)
    intrin[..., 0, 0] = 707.0
    intrin[..., 1, 1] = 707.0
    intrin[..., 0, 2] = w / 2.0
    intrin[..., 1, 2] = h / 2.0
    intrin[..., 2, 2] = 1.0
    r = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    return {
        "imgs": jnp.asarray(
            rng.randn(b, 2, h, w, 3).astype(np.float32),
            dtype=dtype or jnp.bfloat16,
        ),
        "rots": jnp.asarray(np.broadcast_to(r, (b, 2, 3, 3)).copy()),
        "trans": jnp.zeros((b, 2, 3)),
        "intrins": jnp.asarray(intrin),
        "post_rots": jnp.asarray(eye3.copy()),
        "post_trans": jnp.zeros((b, 2, 3)),
        "bda": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
        ),
        "calib": jnp.asarray(np.full((b,), 707.0 * 0.54, np.float32)),
    }


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
    from stereoscene_tpu.ops.resize import resize_trilinear

    # inference config: activation checkpointing off (remat only pays during
    # training; measured ~30% slower forward)
    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    b = 1
    batch = make_flagship_batch(cfg, b)

    # static splat plan (host-side, once per calibration — exactly how the
    # eval CLI runs; see ops/splat_plan.py)
    from stereoscene_tpu.ops.splat_plan import SplatPlanCache

    geo_keys = ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
    planned = SplatPlanCache(model, int(np.prod(cfg.grid_shape))).attach(
        {k: np.asarray(batch[k]) for k in geo_keys}
    )
    batch["splat_order"] = jnp.asarray(planned["splat_order"])
    batch["splat_ranks"] = jnp.asarray(planned["splat_ranks"])
    batch["splat_bounds"] = jnp.asarray(planned["splat_bounds"])

    # Splat-accuracy cross-check at the REAL plan size (advisor round-4):
    # the scatter-free splat is cumsum-then-difference, whose fp32 error
    # grows with the running sum over this plan's ~1-2M rows — CI only
    # gates tiny shapes, so every bench run cross-checks the production
    # plan against the scatter-based segment_sum once (one extra dispatch).
    # Signed randn values are the harshest cancellation test; real
    # depth-weighted features are mostly one-signed.
    def _splat_check():
        from stereoscene_tpu.ops.voxel_pool import segment_sum_bounds

        rk = np.asarray(batch["splat_ranks"]).reshape(-1)
        bounds = np.asarray(batch["splat_bounds"]).reshape(-1)
        nvox = int(np.prod(cfg.grid_shape))
        vals = np.random.RandomState(7).randn(rk.shape[0], 8).astype(
            np.float32
        )
        vals[rk >= nvox] = 0.0
        got = jax.jit(segment_sum_bounds, static_argnums=3)(
            jnp.asarray(vals), jnp.asarray(rk), jnp.asarray(bounds), nvox
        )
        ref = jax.jit(
            lambda v, r: jax.ops.segment_sum(v, r, num_segments=nvox)
        )(jnp.asarray(vals), jnp.asarray(rk.astype(np.int32)))
        err = float(jnp.max(jnp.abs(got - ref))
                    / jnp.maximum(jnp.max(jnp.abs(ref)), 1e-6))
        print(f"# splat cumsum-vs-scatter rel err at {rk.shape[0]} plan "
              f"rows: {err:.2e}", file=sys.stderr, flush=True)
        if err > 1e-2:
            raise AssertionError(
                f"cumsum splat drifted at bench plan size: rel err {err:.2e}"
            )

    _splat_check()

    # Throughput benchmark: parameter *values* are irrelevant, so build the
    # variables tree from eval_shape with cheap host randomness instead of
    # running the real init graph (which costs minutes of XLA compile).
    t0 = time.time()
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    host_rng = np.random.RandomState(0)

    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        shape = leaf.shape
        if leaf.dtype == jnp.uint32:  # rng keys in state collections
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
    variables = jax.device_put(
        jax.tree.map(
            lambda x: jnp.asarray(x, dtype=jnp.bfloat16)
            if x.dtype == np.float32
            else jnp.asarray(x),
            variables,
        ),
        jax.devices()[0],
    )
    jax.block_until_ready(variables)
    print(f"# variables ready: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # staged forward
    @jax.jit
    def stage_images(variables, imgs):
        return model.apply(variables, imgs, method="encode_images")

    @jax.jit
    def stage_view(variables, feat_left, feat_right, batch):
        return model.apply(
            variables, feat_left, feat_right, batch, method="view_transform"
        )

    @jax.jit
    def stage_bev(variables, voxel_feat):
        head_out, _ = model.apply(variables, voxel_feat, method="bev_encode")
        logits = head_out["output_voxels"][0].astype(jnp.float32)
        logits = resize_trilinear(logits, (256, 256, 32))
        return jnp.argmax(logits, axis=-1)

    def forward(batch):
        fl, fr = stage_images(variables, batch["imgs"])
        voxel_feat, _ = stage_view(variables, fl, fr, batch)
        return stage_bev(variables, voxel_feat)

    # compile each stage with progress
    t0 = time.time()
    fl, fr = stage_images(variables, batch["imgs"])
    jax.block_until_ready(fl)
    print(f"# stage_images compiled: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    voxel_feat, _ = stage_view(variables, fl, fr, batch)
    jax.block_until_ready(voxel_feat)
    print(f"# stage_view compiled: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    pred = stage_bev(variables, voxel_feat)
    jax.block_until_ready(pred)
    print(f"# stage_bev compiled: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    # Per-stage steady-state latency (the reference's record_time table,
    # ref bevdepth_occupancy.py:252-263).
    #
    # NOTE on methodology: on tunneled backends ``block_until_ready`` can
    # return before execution (a 1 TFLOP matmul "measures" 100x chip peak),
    # so every timing below chains each iteration's input on the previous
    # output and stops the clock only after fetching a scalar to host.
    def timeit(fn, make_args, reduce_out, iters=20):
        def loop(n):
            feedback = 0.0
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*make_args(feedback))
                feedback = reduce_out(out) * 0
            _ = float(feedback)
            return (time.perf_counter() - t0) / n * 1000

        loop(5)  # warm-up: first executions after compile are ~1s slower
        return loop(iters)

    t_img = timeit(
        stage_images,
        lambda fb: (variables, batch["imgs"] + jnp.asarray(fb, batch["imgs"].dtype)),
        lambda out: jnp.max(jnp.abs(out[0].astype(jnp.float32))),
    )
    t_view = timeit(
        stage_view,
        lambda fb: (variables, fl + jnp.asarray(fb, fl.dtype), fr, batch),
        lambda out: jnp.max(jnp.abs(out[0].astype(jnp.float32))),
    )
    t_bev = timeit(
        stage_bev,
        lambda fb: (variables, voxel_feat + jnp.asarray(fb, voxel_feat.dtype)),
        lambda out: jnp.max(out).astype(jnp.float32),
    )
    print(
        f"# stage ms: images {t_img:.2f}, view {t_view:.2f}, "
        f"bev {t_bev:.2f}",
        file=sys.stderr,
        flush=True,
    )

    # steady-state timing with chained data dependencies: each iteration's
    # input depends on the previous prediction and the final scalar is
    # fetched to host, so the device must execute every step before the
    # clock stops (robust against async-dispatch/relay timing artifacts)
    imgs0 = batch["imgs"]

    def full_loop(iters):
        t0 = time.perf_counter()
        feedback = jnp.zeros((), imgs0.dtype)
        for _ in range(iters):
            chained = dict(batch)
            chained["imgs"] = imgs0 + feedback
            pred = forward(chained)
            feedback = (jnp.max(pred) * 0).astype(imgs0.dtype)
        _ = float(feedback)  # host fetch forces completion of the chain
        return time.perf_counter() - t0

    # Median of several independent timing loops: the relay's run-to-run
    # noise is ~2% and occasionally a single loop lands a multi-ms stall;
    # one 20-iter loop can report an unlucky number (VERDICT r2 weak #2).
    full_loop(3)  # warm-up
    iters, n_loops = 8, 5
    dts = sorted(full_loop(iters) for _ in range(n_loops))
    print(
        "# full-loop fps samples: "
        + ", ".join(f"{b * iters / d:.2f}" for d in dts),
        file=sys.stderr,
        flush=True,
    )
    dt = dts[n_loops // 2]

    fps = b * iters / dt
    print(
        json.dumps(
            {
                "metric": "SSC frames/sec/chip (SemanticKITTI 256x256x32)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / ASSUMED_A100_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
