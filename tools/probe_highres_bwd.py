#!/usr/bin/env python
"""Stage-level backward bisection of the highres slice (round-5, PERF.md).

The 1/8-shard highres train step runs ~12 s while its forward runs 124 ms —
a 97x fwd->train blowup (flagship: 4.2x). This probe times jax.grad through
each stage IN ISOLATION at slice shapes (same remat flags as training) to
name the stage that owns the backward blowup:

  images : encode_images          (b7 + SECONDFPN, backbone remat)
  view   : view_transform         (stereo + MIE + depthnet + splat)
  bev    : bev_encode + CE loss   (ResNet3D + FPN3D + OccHead)

Usage: python tools/probe_highres_bwd.py [--shards 8] [--iters 3]
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
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _make_batch
    from stereoscene_tpu.config import Config
    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )

    repo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    hr = DetectorConfig.from_config(Config.fromfile(os.path.join(
        repo, "stereoscene_tpu", "configs", "stereoscene_highres.py")))
    x, y, z = hr.grid_shape
    xs = x // args.shards
    sx = hr.xbound[2]
    cfg = dataclasses.replace(
        hr, xbound=(hr.xbound[0], hr.xbound[0] + sx * xs, sx),
        backbone_with_cp=True, bev_with_cp=True,
    )
    model = BEVDepthOccupancy(cfg=cfg)
    batch = _make_batch(cfg, b=1)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=True), jax.random.PRNGKey(0)
    )
    rng = np.random.RandomState(0)

    def fill(p_, l):
        n = "/".join(str(getattr(k, "key", k)) for k in p_)
        if l.dtype == jnp.uint32:
            return np.zeros(l.shape, np.uint32)
        if "scale" in n or "var" in n:
            return np.ones(l.shape, np.float32)
        if "bias" in n or "mean" in n or "gamma" in n:
            return np.zeros(l.shape, np.float32)
        f = int(np.prod(l.shape[:-1])) or 1
        return rng.randn(*l.shape).astype(np.float32) / np.sqrt(f)

    variables = jax.device_put(
        jax.tree.map(jnp.asarray,
                     jax.tree_util.tree_map_with_path(fill, shapes)),
        jax.devices()[0],
    )
    jax.block_until_ready(variables)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    bf = jnp.bfloat16
    imgs = batch["imgs"].astype(bf)

    def apply(p, method, *a, **kw):
        out, _ = model.apply({"params": p, **rest}, *a, method=method,
                             train=True, mutable=["batch_stats"], **kw)
        return out

    # stage inputs from a warm forward
    fl, fr = apply(params, "encode_images", imgs)
    voxel_feat, _ = apply(params, "view_transform", fl, fr, batch)
    jax.block_until_ready(voxel_feat)

    def g_images(p, x_):
        out = apply(p, "encode_images", x_)
        return jnp.sum(out[0].astype(jnp.float32) ** 2) * 1e-6

    def g_view(p, a, b_):
        vf, dp = apply(p, "view_transform", a, b_, batch)
        return jnp.sum(vf.astype(jnp.float32) ** 2) * 1e-6

    def g_bev(p, vf):
        head_out, _ = apply(p, "bev_encode", vf)
        return jnp.sum(head_out["output_voxels"][0].astype(jnp.float32) ** 2
                       ) * 1e-6

    stages = [
        ("images", g_images, (imgs,)),
        ("view", g_view, (fl, fr)),
        ("bev", g_bev, (voxel_feat,)),
    ]
    for name, fn, a in stages:
        jit = jax.jit(jax.grad(fn))
        t0 = time.time()
        g = jit(params, *a)
        jax.block_until_ready(g)
        compile_s = time.time() - t0
        # warm to steady (absorb donation/layout recompiles; see
        # tools/highres_slice.py round-5 note)
        for w in range(5):
            tw = time.perf_counter()
            g = jit(params, *a)
            leaf = jax.tree.leaves(g)[0]
            _ = float(jnp.sum(leaf.astype(jnp.float32)))
            if time.perf_counter() - tw < max(8.0, 0.0):
                break
        t0 = time.perf_counter()
        fb = 0.0
        for i in range(args.iters):
            # chain via a param perturbation so iterations can't overlap
            p2 = dict(params)
            g = jit(params, *a)
            leaf = jax.tree.leaves(g)[0]
            fb = float(jnp.sum(leaf.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({
            "stage": name, "grad_ms": round(dt * 1000, 1),
            "compile_s": round(compile_s, 1), "fb": fb,
        }), flush=True)


if __name__ == "__main__":
    main()
