#!/usr/bin/env python
"""On-chip probe: where does the super-linear batch cost live?

Round-2 measured B=1 9.6 / B=2 6.5 / B=4 5.3 fps (per-frame cost RISING
with batch — the opposite of normal batching economics) and the training
step shows the same signature (B=2 step = 3.7x B=1). This probe times each
staged-forward unit (image encoder / view transform / bev encoder+head) and
the view-transform submodules at B=1/2/4 to locate the stage whose cost
grows super-linearly, using the chained-dependency methodology from
PERF.md (relay's block_until_ready is unreliable).

Usage: python tools/probe_batch.py [stages|view|all] [--batches 1,2,4]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import dispatch_overhead, make_variables, timeit  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", nargs="?", default="all",
                   choices=["stages", "view", "all"])
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args()
    batches = [int(b) for b in args.batches.split(",")]

    from bench import make_flagship_batch
    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.resize import resize_trilinear
    from stereoscene_tpu.ops.splat_plan import SplatPlanCache

    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    fH, fW, D, C_in, C_tr = 48, 160, 112, 640, 128

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    batch1 = make_flagship_batch(cfg, 1)
    variables = make_variables(model, (batch1,))
    geo_keys = ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
    plan_cache = SplatPlanCache(model, int(np.prod(cfg.grid_shape)))

    if args.which in ("stages", "all"):
        for b in batches:
            batch = make_flagship_batch(cfg, b)
            planned = plan_cache.attach(
                {k: np.asarray(batch[k]) for k in geo_keys}
            )
            batch["splat_order"] = jnp.asarray(planned["splat_order"])
            batch["splat_ranks"] = jnp.asarray(planned["splat_ranks"])

            t_img = timeit(
                lambda imgs: model.apply(variables, imgs,
                                         method="encode_images")[0],
                batch["imgs"], iters=args.iters,
            )
            fl = jnp.asarray(rng.randn(b, fH, fW, C_in), dt)
            fr = jnp.asarray(rng.randn(b, fH, fW, C_in), dt)
            t_view = timeit(
                lambda fl_: model.apply(variables, fl_, fr, batch,
                                        method="view_transform")[0],
                fl, iters=args.iters,
            )
            vox = jnp.asarray(
                rng.randn(b, *cfg.grid_shape, cfg.numC_Trans), dt
            )

            def stage_bev(v):
                head_out, _ = model.apply(variables, v, method="bev_encode")
                logits = head_out["output_voxels"][0].astype(jnp.float32)
                logits = resize_trilinear(logits, (256, 256, 32))
                return jnp.argmax(logits, axis=-1)

            t_bev = timeit(stage_bev, vox, iters=args.iters)
            tot = t_img + t_view + t_bev
            print(
                f"B={b}: images {t_img:7.2f}  view {t_view:7.2f}  "
                f"bev {t_bev:7.2f}  total {tot:7.2f} ms "
                f"({tot / b:6.2f} ms/frame, {1000.0 * b / tot:5.2f} fps)",
                flush=True,
            )

    if args.which in ("view", "all"):
        from stereoscene_tpu.models.stereo_volume import GwcVolumeEncoder
        from stereoscene_tpu.models.mie import VolumeInteraction
        from stereoscene_tpu.models.depth_net import DepthNet
        from stereoscene_tpu.ops.voxel_pool import lift_splat

        for b in batches:
            feat_l = jnp.asarray(rng.randn(b, fH, fW, C_in), dt)
            feat_r = jnp.asarray(rng.randn(b, fH, fW, C_in), dt)
            mlp = jnp.asarray(rng.randn(b, 30), jnp.float32)
            calib = jnp.asarray(np.full((b,), 707.0 * 0.54, np.float32))

            m = GwcVolumeEncoder(max_disp=D)
            v = make_variables(m, (feat_l, feat_r, mlp, mlp, calib))
            t_st = timeit(
                lambda fl: m.apply(v, fl, feat_r, mlp, mlp,
                                   calib)["single_channel"],
                feat_l, iters=args.iters,
            )

            sp = jnp.asarray(rng.rand(b, D, fH, fW), dt)
            lp = jnp.asarray(rng.rand(b, D, fH, fW), dt)
            mm = VolumeInteraction()
            mv = make_variables(mm, (sp, lp))
            t_mie = timeit(lambda a: mm.apply(mv, a, lp), sp,
                           iters=args.iters)

            dm = DepthNet(mid_channels=C_in, context_channels=C_tr,
                          depth_channels=D, cam_channels=30)
            dv = make_variables(dm, (feat_l, mlp))
            t_dn = timeit(lambda x: dm.apply(dv, x, mlp), feat_l,
                          iters=args.iters)

            dp = jnp.asarray(rng.rand(b, D, fH, fW), jnp.float32)
            img = jnp.asarray(rng.randn(b, fH, fW, C_tr), jnp.float32)
            nvox = int(np.prod(cfg.grid_shape))
            ranks = jnp.asarray(
                rng.randint(0, nvox + 1, (b, D * fH * fW)).astype(np.int32)
            )
            t_sp = timeit(
                lambda d: lift_splat(d, img, ranks, cfg.grid_shape), dp,
                iters=args.iters,
            )
            print(
                f"B={b}: stereo {t_st:7.2f}  mie {t_mie:6.2f}  "
                f"depthnet {t_dn:6.2f}  splat {t_sp:6.2f} ms",
                flush=True,
            )


if __name__ == "__main__":
    main()
