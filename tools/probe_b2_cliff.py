#!/usr/bin/env python
"""Root-cause probe for the B=2 super-linear cost cliff (VERDICT r3 weak #4).

Round-2/3 measured B=1 9.6 -> B=2 6.5 fps inference (1.48x per-frame cost)
and a 3.7x train-step blowup, with no named cause. This probe:

1. times each inference stage (images / view / bev) at B=1 and B=2 to
   locate WHERE the super-linearity lives (a stage that scales linearly
   costs exactly 2x at B=2);
2. for each stage, compares XLA's own compiled cost analysis (flops,
   bytes accessed) across batch — flops must scale 2.0x by construction,
   so a bytes ratio well above 2.0 indicates layout/copy blowup rather
   than arithmetic;
3. dumps an opcode histogram diff of the optimized HLO (copies,
   transposes, fusion count) for the worst stage.

agg4d is forced OFF so B=1 and B=2 compile the same (5D-conv) graph —
otherwise the B=1 program would be the slice-packed rank-4 variant and
the comparison would conflate the cliff with the agg4d gate.

Usage: python tools/probe_b2_cliff.py [--stages images,view,bev]
"""
import argparse
import collections
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("STEREOSCENE_AGG4D", "0")

import numpy as np


def opcode_hist(hlo_text):
    hist = collections.Counter()
    bytes_by_op = collections.Counter()
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        op_m = re.search(r"= \S+ (\w[\w\-]*)\(", line)
        if not op_m:
            continue
        op = op_m.group(1)
        dims = [int(d) for d in m.group(2).split(",") if d]
        n = int(np.prod(dims)) if dims else 1
        hist[op] += 1
        bytes_by_op[op] += n
    return hist, bytes_by_op


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="images,view,bev")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()
    stages = args.stages.split(",")

    import jax
    import jax.numpy as jnp

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

    results = {}
    hlo = {}
    for b in (1, 2):
        batch = make_flagship_batch(cfg, b)
        geo = ("rots", "trans", "intrins", "post_rots", "post_trans", "bda")
        planned = SplatPlanCache(model, int(np.prod(cfg.grid_shape))).attach(
            {k: np.asarray(batch[k]) for k in geo})
        batch["splat_order"] = jnp.asarray(planned["splat_order"])
        batch["splat_ranks"] = jnp.asarray(planned["splat_ranks"])

        shapes = jax.eval_shape(
            lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
        )
        variables = jax.tree_util.tree_map_with_path(fill, shapes)
        variables = jax.device_put(
            jax.tree.map(
                lambda x: jnp.asarray(x, jnp.bfloat16)
                if x.dtype == np.float32 else jnp.asarray(x), variables),
            jax.devices()[0])
        jax.block_until_ready(variables)

        @jax.jit
        def stage_images(variables, imgs):
            return model.apply(variables, imgs, method="encode_images")

        @jax.jit
        def stage_view(variables, fl, fr, batch):
            return model.apply(variables, fl, fr, batch,
                               method="view_transform")

        @jax.jit
        def stage_bev(variables, vf):
            head_out, _ = model.apply(variables, vf, method="bev_encode")
            logits = head_out["output_voxels"][0].astype(jnp.float32)
            logits = resize_trilinear(logits, (256, 256, 32))
            return jnp.argmax(logits, axis=-1)

        fl, fr = stage_images(variables, batch["imgs"])
        vf, _ = stage_view(variables, fl, fr, batch)
        pred = stage_bev(variables, vf)
        jax.block_until_ready(pred)

        def timeit(fn, chain_arg, other, reduce0, iters=args.iters):
            def loop(n):
                fb = jnp.zeros((), jnp.bfloat16)
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(variables, chain_arg + fb.astype(chain_arg.dtype),
                             *other)
                    o0 = out[0] if isinstance(out, tuple) else out
                    fb = (reduce0(o0) * 0).astype(jnp.bfloat16)
                _ = float(fb)
                return (time.perf_counter() - t0) / n * 1000
            loop(4)
            return loop(iters)

        fns = {
            "images": (stage_images, batch["imgs"], (),
                       lambda o: jnp.max(jnp.abs(o.astype(jnp.float32)))),
            "view": (stage_view, fl, (fr, batch),
                     lambda o: jnp.max(jnp.abs(o.astype(jnp.float32)))),
            "bev": (stage_bev, vf, (),
                    lambda o: jnp.max(o).astype(jnp.float32)),
        }
        for name in stages:
            fn, carg, other, red = fns[name]
            t = timeit(fn, carg, other, red)
            # compiled artifact introspection
            sig = {
                "images": (variables, batch["imgs"]),
                "view": (variables, fl, fr, batch),
                "bev": (variables, vf),
            }[name]
            comp = fn.lower(*sig).compile()
            try:
                ca = comp.cost_analysis()
                ca = ca[0] if isinstance(ca, (list, tuple)) else ca
                flops = ca.get("flops", float("nan"))
                bytes_ = ca.get("bytes accessed", float("nan"))
            except Exception as e:  # relay may not support it
                flops = bytes_ = float("nan")
                print(f"# cost_analysis failed: {e}", file=sys.stderr)
            try:
                hlo[(name, b)] = comp.as_text()
            except Exception:
                hlo[(name, b)] = ""
            results[(name, b)] = (t, flops, bytes_)
            print(f"B={b} {name:6s}: {t:7.2f} ms  flops={flops:.3e} "
                  f"bytes={bytes_:.3e}", flush=True)

    print("\n# ratios (B=2 / B=1); linear scaling = 2.00:")
    worst, worst_ratio = None, 0.0
    for name in stages:
        t1, f1, by1 = results[(name, 1)]
        t2, f2, by2 = results[(name, 2)]
        r = t2 / t1
        print(f"{name:6s}: time x{r:.2f}  flops x{f2 / f1:.2f}  "
              f"bytes x{by2 / by1:.2f}", flush=True)
        if r > worst_ratio:
            worst, worst_ratio = name, r

    print(f"\n# opcode histogram diff for worst stage '{worst}' "
          f"(count@B=2 - 2*count@B=1 where positive):")
    h1, n1 = opcode_hist(hlo[(worst, 1)])
    h2, n2 = opcode_hist(hlo[(worst, 2)])
    rows = []
    for op in sorted(set(h1) | set(h2)):
        dc = h2[op] - h1[op]
        delem = n2[op] - 2 * n1[op]
        rows.append((delem, op, h1[op], h2[op], n1[op], n2[op]))
    rows.sort(reverse=True)
    print(f"{'op':24s} {'cnt1':>6s} {'cnt2':>6s} {'elem1':>12s} "
          f"{'elem2':>12s} {'elem2-2*elem1':>14s}")
    for delem, op, c1, c2, e1, e2 in rows[:18]:
        print(f"{op:24s} {c1:6d} {c2:6d} {e1:12d} {e2:12d} {delem:14d}")


if __name__ == "__main__":
    main()
