#!/usr/bin/env python
"""HLO-dump diagnosis of the highres-slice train step (round-4 verdict 4).

The 1/8-shard train step analyzes ~18 TFLOP / ~410 GB (floors: 90 ms
compute, 500 ms bytes) yet measures 200+ s — a 500x gap that neither
flops nor streamed bytes explain. This probe compiles the same step and
interrogates the optimized HLO itself:

  * opcode histogram (count + total output elements)
  * the 20 largest-output ops (shape + a trimmed instruction line)
  * while/sort/scatter/gather inventory — serializing constructs

Usage: python tools/probe_highres_hlo.py [--shards 8] [--no-bev-cp]
       [--stream-chunks 16] [--mode train|forward]
(compile only — no step execution, so it can run while the chip is busy)
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--stream-chunks", type=int, default=16)
    p.add_argument("--no-bev-cp", action="store_true")
    p.add_argument("--mode", default="train", choices=["train", "forward"])
    p.add_argument("--dump", default=None,
                   help="also write the full optimized HLO text here")
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
    hr_full = DetectorConfig.from_config(
        Config.fromfile(os.path.join(
            repo, "stereoscene_tpu", "configs", "stereoscene_highres.py"))
    )
    x, y, z = hr_full.grid_shape
    x_slice = x // args.shards
    step_x = hr_full.xbound[2]
    train = args.mode == "train"
    cfg = dataclasses.replace(
        hr_full,
        xbound=(hr_full.xbound[0],
                hr_full.xbound[0] + step_x * x_slice, step_x),
        backbone_with_cp=train,
        bev_with_cp=train and not args.no_bev_cp,
    )
    model = BEVDepthOccupancy(cfg=cfg)
    batch = _make_batch(cfg, b=1)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=train), jax.random.PRNGKey(0)
    )
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )

    if train:
        from stereoscene_tpu.engine.train import (
            LossConfig, create_train_state, make_train_step,
        )

        state = create_train_state(model, variables, steps_per_epoch=10)
        train_step = make_train_step(
            model, LossConfig(downsample=cfg.downsample, dbound=cfg.dbound,
                              stream_voxel_chunks=args.stream_chunks),
            bf16=True,
        )
        lowered = jax.jit(train_step, donate_argnums=(0,)).lower(
            state, batch, jax.random.PRNGKey(0))
    else:
        lowered = jax.jit(
            lambda v, b: model.apply(v, b, train=False)
        ).lower(variables, batch)

    hlo = lowered.compile().as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo)
        print(f"# wrote {len(hlo)} bytes of HLO to {args.dump}",
              file=sys.stderr)

    shape_re = re.compile(r"([a-z0-9_]+)\[([0-9,]*)\]")
    op_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?[\w.\-]+\s*=\s*([a-z0-9_]+)\[([0-9,]*)\]"
        r"[^ ]*\s+([a-z\-]+)\(", re.M)

    counts = collections.Counter()
    elements = collections.Counter()
    biggest = []
    for m in op_re.finditer(hlo):
        _, dims, opcode = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        counts[opcode] += 1
        elements[opcode] += n
        biggest.append((n, m.group(0)[:160]))

    print("== opcode histogram (count, total output elements) ==")
    for op, c in counts.most_common(25):
        print(f"  {op:28s} {c:6d}  {elements[op]:>16,d}")
    print("\n== 20 largest-output instructions ==")
    biggest.sort(key=lambda t: -t[0])
    for n, line in biggest[:20]:
        print(f"  {n:>16,d}  {line.strip()}")
    print("\n== serializing constructs ==")
    for key in ("while(", " sort(", "scatter(", "all-reduce(",
                "dynamic-update-slice(", "dynamic-slice(", "rng-"):
        c = hlo.count(key)
        print(f"  {key:24s} {c}")


if __name__ == "__main__":
    main()
