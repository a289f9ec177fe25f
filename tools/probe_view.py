#!/usr/bin/env python
"""On-chip probe: the view-transform stage and its submodules, under the
flagship config. Chained-dependency timing; ~3.9 ms/dispatch relay overhead
is measured and subtracted (see PERF.md methodology).

Usage: python tools/probe_view.py [stereo|mie|depthnet|splat|stage|all]
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


def make_variables(model, init_args, seed=0, **init_kwargs):
    """Shape-only init + host randomness (eager init over the relay is
    pathological; see bench.py)."""
    shapes = jax.eval_shape(
        lambda k: model.init(k, *init_args, **init_kwargs),
        jax.random.PRNGKey(seed),
    )
    host_rng = np.random.RandomState(seed)

    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        if leaf.dtype == jnp.uint32:
            return np.zeros(leaf.shape, np.uint32)
        if "scale" in name or "var" in name:
            arr = np.ones(leaf.shape, np.float32)
        elif "gamma" in name or "alpha" in name:
            # NONZERO residual gates: probes close variables over as jit
            # constants (weights-as-args exceed the remote-compile request
            # limit), and zero-init gates would let XLA constant-fold the
            # whole gated branch away — trained checkpoints have nonzero
            # gates, so a timing probe must too (round-4 finding: the MIE
            # marginal measured 5+ ms low with folded gates).
            arr = np.full(leaf.shape, 0.1, np.float32)
        elif "bias" in name or "mean" in name:
            arr = np.zeros(leaf.shape, np.float32)
        else:
            fan_in = int(np.prod(leaf.shape[:-1])) or 1
            arr = host_rng.randn(*leaf.shape).astype(np.float32) / np.sqrt(fan_in)
        return arr

    variables = jax.tree_util.tree_map_with_path(fill, shapes)
    return jax.tree.map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if x.dtype == np.float32 else jnp.asarray(x),
        variables,
    )


OVERHEAD_MS = None


def dispatch_overhead():
    global OVERHEAD_MS
    if OVERHEAD_MS is None:
        x = jnp.zeros((8, 128), jnp.float32)
        OVERHEAD_MS = timeit(lambda v: v * 1.0001, x, raw=True)
    return OVERHEAD_MS


def timeit(fn, *args, iters=25, raw=False):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    x0 = args[0]

    def loop(n):
        fb = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x0 + fb.astype(x0.dtype), *args[1:])
            leaf = jax.tree.leaves(out)[0]
            fb = jnp.max(jnp.abs(leaf.astype(jnp.float32))) * 0
        _ = float(fb)
        return (time.perf_counter() - t0) / n * 1000

    loop(8)
    t = loop(iters)
    return t if raw else max(t - dispatch_overhead(), 0.0)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    B, fH, fW, D, C_in, C_tr = 1, 48, 160, 112, 640, 128

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    feat_l = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)
    feat_r = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)
    mlp = jnp.asarray(rng.randn(B, 30), jnp.float32)
    calib = jnp.asarray(np.full((B,), 707.0 * 0.54, np.float32))

    if which in ("stereo", "all"):
        from stereoscene_tpu.models.stereo_volume import (
            GwcVolumeEncoder, Hourglass3D, StereoFeatureNet,
        )

        m = GwcVolumeEncoder(max_disp=D)
        v = make_variables(m, (feat_l, feat_r, mlp, mlp, calib))
        t = timeit(
            lambda fl: m.apply(v, fl, feat_r, mlp, mlp, calib)["single_channel"],
            feat_l,
        )
        print(f"stereo encoder total: {t:.2f} ms", flush=True)

        hm = Hourglass3D(32)
        vol = jnp.asarray(rng.randn(B, D, fH, fW, 32), dt)
        hv = make_variables(hm, (vol,))
        t = timeit(lambda x: hm.apply(hv, x), vol)
        print(f"  one hourglass: {t:.2f} ms", flush=True)

        sm = StereoFeatureNet()
        both = jnp.concatenate([feat_l, feat_r], 0)
        sv = make_variables(sm, (both, jnp.concatenate([mlp, mlp], 0)))
        t = timeit(lambda x: sm.apply(sv, x, jnp.concatenate([mlp, mlp], 0)),
                   both)
        print(f"  stereofeature_net: {t:.2f} ms", flush=True)

        from stereoscene_tpu.ops.gwc import (
            groupwise_correlation_volume, warp_disparity_to_depth,
        )
        from stereoscene_tpu.geometry import disparity_positions

        mf = jnp.asarray(rng.randn(B, fH, fW, 64), dt)

        def gwc_warp(a):
            volc = groupwise_correlation_volume(a, mf, D, 32)
            pos = disparity_positions(calib, D)
            return warp_disparity_to_depth(volc, pos)

        t = timeit(gwc_warp, mf)
        print(f"  gwc volume + warp: {t:.2f} ms", flush=True)

    if which in ("mie", "all"):
        from stereoscene_tpu.models.mie import VolumeInteraction, BRIAttention, CA3D

        sp = jnp.asarray(rng.rand(B, D, fH, fW), dt)
        lp = jnp.asarray(rng.rand(B, D, fH, fW), dt)
        m = VolumeInteraction()
        v = make_variables(m, (sp, lp))
        t = timeit(lambda a: m.apply(v, a, lp), sp)
        print(f"MIE total: {t:.2f} ms", flush=True)

        bm = BRIAttention()
        bv = make_variables(bm, (sp, lp))
        t = timeit(lambda a: bm.apply(bv, a, lp), sp)
        print(f"  one BRI direction: {t:.2f} ms", flush=True)

        cm = CA3D(32)
        cx = jnp.asarray(rng.randn(B, D, fH, fW, 32), dt)
        cv = make_variables(cm, (cx,))
        t = timeit(lambda x: cm.apply(cv, x), cx)
        print(f"  CA3D: {t:.2f} ms", flush=True)

    if which in ("depthnet", "all"):
        from stereoscene_tpu.models.depth_net import DepthNet

        m = DepthNet(mid_channels=C_in, context_channels=C_tr,
                     depth_channels=D, cam_channels=30)
        v = make_variables(m, (feat_l, mlp))
        t = timeit(lambda x: m.apply(v, x, mlp), feat_l)
        print(f"DepthNet: {t:.2f} ms", flush=True)

    if which in ("splat", "all"):
        from stereoscene_tpu.ops.voxel_pool import lift_splat

        dp = jnp.asarray(rng.rand(B, D, fH, fW), jnp.float32)
        img = jnp.asarray(rng.randn(B, fH, fW, C_tr), jnp.float32)
        nvox = 128 * 128 * 16
        ranks_np = rng.randint(0, nvox + 1, (B, D * fH * fW)).astype(np.int32)
        ranks = jnp.asarray(ranks_np)
        t = timeit(lambda d: lift_splat(d, img, ranks, (128, 128, 16)), dp)
        print(f"splat (XLA scatter, random ranks): {t:.2f} ms", flush=True)

        from stereoscene_tpu.ops.pallas_splat import pallas_lift_splat

        t = timeit(lambda d: pallas_lift_splat(d, img, ranks, (128, 128, 16)),
                   dp)
        print(f"splat (pallas sorted, device argsort): {t:.2f} ms", flush=True)

    if which in ("stage", "all"):
        import __graft_entry__  # noqa: F401  (sys.path setup)
        from stereoscene_tpu.models.detector import (
            BEVDepthOccupancy, DetectorConfig,
        )
        from bench import make_flagship_batch

        cfg = DetectorConfig(backbone_with_cp=False)
        model = BEVDepthOccupancy(cfg=cfg)
        batch = make_flagship_batch(cfg, 1)
        variables = make_variables(model, (batch,))
        fl = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)
        fr = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)

        def stage_view(fl_, fr_, batch_):
            return model.apply(variables, fl_, fr_, batch_,
                               method="view_transform")[0]

        t = timeit(stage_view, fl, fr, batch)
        print(f"stage_view (full): {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
