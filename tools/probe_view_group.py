#!/usr/bin/env python
"""On-chip probe: full view-transform stage latency vs splat plan group.

tools/probe_splat_group.py measures the splat op in isolation; this probe
answers the question that matters for bench.py: what does the *whole*
compiled stage_view cost with each plan group? The grouped plan pads every
per-voxel run to a multiple of G (ops/splat_plan.py), which on the real
bench calibration inflates the plan row count several-fold — the gather
that materializes the lifted rows scales with padded rows, so a group that
wins in isolation can lose in-graph.

Usage: python tools/probe_view_group.py [groups...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    groups = [int(g) for g in sys.argv[1:]] or [1, 2, 4, 8]

    from bench import make_flagship_batch
    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.splat_plan import SplatPlanCache

    rng = np.random.RandomState(0)
    b = 1

    # feature shapes via abstract eval (no compile)
    cfg0 = DetectorConfig(backbone_with_cp=False)
    model0 = BEVDepthOccupancy(cfg=cfg0)
    batch = make_flagship_batch(cfg0, b)
    shapes = jax.eval_shape(
        lambda k: model0.init(k, batch, train=False), jax.random.PRNGKey(0)
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
            arr = host_rng.randn(*shape).astype(np.float32) / np.sqrt(fan_in)
        return arr

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    variables = jax.device_put(
        jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16)
            if x.dtype == np.float32 else jnp.asarray(x),
            variables,
        ),
        jax.devices()[0],
    )
    jax.block_until_ready(variables)

    feat_shape = jax.eval_shape(
        lambda v, im: model0.apply(v, im, method="encode_images"),
        shapes, jax.ShapeDtypeStruct(batch["imgs"].shape, jnp.bfloat16),
    )[0]
    fl = jnp.asarray(
        rng.randn(*feat_shape.shape).astype(np.float32), jnp.bfloat16)
    fr = jnp.asarray(
        rng.randn(*feat_shape.shape).astype(np.float32), jnp.bfloat16)
    print(f"# feat shape {feat_shape.shape}", flush=True)

    geo_keys = ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
    geo = {k: np.asarray(batch[k]) for k in geo_keys}

    def timeit(fn, args, iters=20):
        def loop(n):
            fb = jnp.zeros((), jnp.bfloat16)
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(args[0] + fb, *args[1:])
                fb = (jnp.max(jnp.abs(out[0].astype(jnp.float32))) * 0
                      ).astype(jnp.bfloat16)
            _ = float(fb)
            return (time.perf_counter() - t0) / n * 1000
        loop(5)
        return loop(iters)

    for g in groups:
        cfg = DetectorConfig(backbone_with_cp=False, splat_group=g)
        model = BEVDepthOccupancy(cfg=cfg)
        planned = SplatPlanCache(
            model, int(np.prod(cfg.grid_shape))).attach(dict(geo))
        bt = dict(batch)
        bt["splat_order"] = jnp.asarray(planned["splat_order"])
        bt["splat_ranks"] = jnp.asarray(planned["splat_ranks"])
        n_rows = bt["splat_order"].shape[-1]

        @jax.jit
        def stage_view(fl, fr, bt, model=model):
            return model.apply(variables, fl, fr, bt,
                               method="view_transform")

        t0 = time.time()
        out = stage_view(fl, fr, bt)
        jax.block_until_ready(out[0])
        tc = time.time() - t0
        t = timeit(lambda a, b_, c: stage_view(a, b_, c), (fl, fr, bt))
        print(f"view group={g:2d}: {t:6.2f} ms  (plan rows {n_rows}, "
              f"compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
