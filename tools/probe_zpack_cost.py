#!/usr/bin/env python
"""Decompose the round-4 training-MFU regression (verdict item 3).

The zpack-NaN fix (models/layers.py _make_zpack_op) costs 385 -> 506 ms/step
at B=1 (PERF.md round-4 table) via two mechanisms that were never measured
separately: the optimization_barrier around every zpack forward, and the
full-f32 backward island. This driver runs tools/bench_train.py under four
gate combinations and prints a table:

  A default            barrier + f32 bwd          (the shipped fix)
  B no-f32-island      barrier + operand-dtype bwd (STEREOSCENE_ZPACK_BWD_F32=0)
  C no-barrier         f32 bwd, no barriers        (STEREOSCENE_ZPACK_BARRIER=0)
  D zpack-off          plain conv3d fwd+bwd        (STEREOSCENE_ZPACK_MAX=0)

B and C are MEASUREMENT-ONLY graphs (C re-exposes the round-3 NaN
miscompile; B's bf16 dW is rounding garbage) — their loss values are
reported but only their step times matter. D is a *correct* candidate
default for training: if it lands within a few % of A, training should not
pay for zpack at all (inference keeps it — separate jit programs).

Usage: python tools/probe_zpack_cost.py [--iters 5]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

VARIANTS = [
    ("A default (barrier + f32 bwd)", {}),
    ("B no-f32-island", {"STEREOSCENE_ZPACK_BWD_F32": "0"}),
    ("C no-barrier", {"STEREOSCENE_ZPACK_BARRIER": "0"}),
    ("D zpack-off (plain conv3d)", {"STEREOSCENE_ZPACK_MAX": "0"}),
    # E is the *candidate fix* (not measurement-only): the zpack-structured
    # autodiff backward — which round 4 replaced with the plain-conv3d VJP —
    # behind the same barriers + f32 island that make A correct. A/B/C
    # proved barrier and island are free; if E recovers toward the round-3
    # 385 ms/step with a finite loss, the backward *structure* was the whole
    # regression and E becomes the default.
    ("E core-bwd (barrier + f32)", {"STEREOSCENE_ZPACK_BWD": "core"}),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    rows = []
    for label, env_over in VARIANTS:
        env = dict(os.environ)
        env.update(env_over)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "bench_train.py"),
             "--batches", "1", "--iters", str(args.iters)],
            cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if r.returncode != 0 or not line:
            print(f"{label}: FAILED\n{r.stderr[-2000:]}", flush=True)
            rows.append((label, None))
            continue
        d = json.loads(line[-1])
        rows.append((label, d))
        print(f"{label}: step {d['step_ms']} ms, mfu {d['mfu']}, "
              f"loss {d['loss']}", flush=True)

    print("\n| variant | step ms | MFU | loss |")
    print("|---|---|---|---|")
    for label, d in rows:
        if d is None:
            print(f"| {label} | FAILED | | |")
        else:
            print(f"| {label} | {d['step_ms']} | {d['mfu']} | {d['loss']} |")


if __name__ == "__main__":
    main()
