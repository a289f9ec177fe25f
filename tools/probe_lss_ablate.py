#!/usr/bin/env python
"""On-chip ablation: in-graph marginal cost of each view-transform component.

The standalone probes (tools/probe_view.py) sum to ~43 ms but the bench's
stage_view measures ~65 ms — the gap is layout/fusion cost that only exists
inside the composed program. This probe times CUMULATIVE compositions of the
real ViewTransformerLiftSplatShootVoxel submodules (same variables tree, same
dtypes as the bench) so successive differences attribute the in-graph cost:

    stereo -> +depthnet -> +MIE -> +lift/splat (full module)

Usage: python tools/probe_lss_ablate.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.probe_view import dispatch_overhead, make_variables, timeit  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    B, fH, fW, D, C_in, C_tr = 1, 48, 160, 112, 640, 128
    grid = (128, 128, 16)
    num_voxels = int(np.prod(grid))

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    from stereoscene_tpu.models.lss import ViewTransformerLiftSplatShootVoxel

    feat_l = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)
    feat_r = jnp.asarray(rng.randn(B, fH, fW, C_in), dt)
    mlp = jnp.asarray(rng.randn(B, 30), jnp.float32)
    calib = jnp.asarray(np.full((B,), 707.0 * 0.54, np.float32))

    # static splat plan with the bench calibration's row count: the real
    # group-8 plan carries 547840 rows = 0.637 * P (tools/probe_view_group)
    p_total = D * fH * fW
    p_pad = int(0.637 * p_total)
    order = np.sort(rng.randint(0, p_total, size=(B, p_pad))).astype(np.int32)
    ranks = np.sort(rng.randint(0, num_voxels, size=(B, p_pad))).astype(np.int32)
    plan = (jnp.asarray(order), jnp.asarray(ranks))

    model = ViewTransformerLiftSplatShootVoxel(
        num_depth=D, numC_input=C_in, numC_Trans=C_tr, grid_shape=grid
    )
    variables = make_variables(
        model, (feat_l, feat_r, mlp, mlp, calib, plan)
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def subvars(name):
        v = {"params": params[name]}
        if name in stats:
            v["batch_stats"] = stats[name]
        return v

    from stereoscene_tpu.models.depth_net import DepthNet
    from stereoscene_tpu.models.mie import VolumeInteraction
    from stereoscene_tpu.models.stereo_volume import GwcVolumeEncoder
    from stereoscene_tpu.ops.voxel_pool import lift_splat_static

    stereo_m = GwcVolumeEncoder(max_disp=D, cam_channels=30)
    dn_m = DepthNet(mid_channels=C_in, context_channels=C_tr,
                    depth_channels=D, cam_channels=30)
    vi_m = VolumeInteraction(attention_chunk=1024)

    def run_stereo(fl):
        return stereo_m.apply(
            subvars("stereo_volume_net"), fl, feat_r, mlp, mlp,
            calib,
        )["single_channel"]

    def run_dn(fl):
        out = dn_m.apply(subvars("depth_net"), fl, mlp)
        digit = out[..., :D]
        img_feat = out[..., D:D + C_tr]
        lss_prob = jax.nn.softmax(digit.astype(jnp.float32), axis=-1)
        return lss_prob.transpose(0, 3, 1, 2).astype(dt), img_feat

    def run_mie(stereo_prob, lss_prob):
        return vi_m.apply(
            subvars("volume_interaction"), stereo_prob, lss_prob,
            False,
        )

    # cumulative compositions (each is ONE jitted program, chained timing)
    def c1(fl):
        return run_stereo(fl)

    def c2(fl):
        sp = run_stereo(fl)
        lp, img = run_dn(fl)
        return sp.astype(jnp.float32).sum() + lp.sum() + img.sum()

    def c3(fl):
        sp = run_stereo(fl)
        lp, img = run_dn(fl)
        fused = run_mie(sp, lp)
        return fused.astype(jnp.float32).sum() + img.sum()

    def c4(fl):
        sp = run_stereo(fl)
        lp, img = run_dn(fl)
        fused = run_mie(sp, lp)
        bev = lift_splat_static(
            fused.astype(jnp.float32), img.astype(jnp.float32),
            plan[0], plan[1], grid,
        )
        return bev

    def c5(fl):
        # the actual module (sanity: should match c4 + mlp/misc)
        bev, fused = model.apply(variables, fl, feat_r, mlp, mlp, calib, plan)
        return bev

    last = 0.0
    for name, fn in [("stereo", c1), ("+depthnet", c2), ("+mie", c3),
                     ("+lift/splat", c4), ("full module", c5)]:
        t = timeit(fn, feat_l)
        print(f"{name:14s}: {t:7.2f} ms  (marginal {t - last:+6.2f})",
              flush=True)
        last = t


if __name__ == "__main__":
    main()
