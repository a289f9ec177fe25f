"""FLOPs / parameter reporting via XLA cost analysis.

Replaces the reference's fvcore FLOPs table printed at eval start
(ref: occupancy/apis/test.py:24,84,171) with the compiler's own numbers:
``jit(fn).lower(...).compile().cost_analysis()`` reports the optimized
HLO's flops and bytes accessed. When compilation is unavailable (e.g. the
remote-compile relay rejects very large graphs), falls back to the
unoptimized-HLO estimate from ``lower(...).cost_analysis()``.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np


def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Returns {'flops': ..., 'bytes_accessed': ..., 'optimized': bool}."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    try:
        cost = lowered.compile().cost_analysis()
        optimized = True
    except Exception:
        cost = lowered.cost_analysis()
        optimized = False
    if isinstance(cost, list):  # older jax returns a per-computation list
        cost = cost[0]
    cost = cost or {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "optimized": optimized,
    }


def report(fn: Callable, params, *args, name: str = "model",
           file=None, **kwargs) -> Dict[str, float]:
    """Print and return a one-line FLOPs/params table entry."""
    out = cost_analysis(fn, *args, **kwargs)
    out["params"] = param_count(params)
    gflops = out["flops"] / 1e9
    gbytes = out["bytes_accessed"] / 1e9
    tag = "optimized HLO" if out["optimized"] else "unoptimized HLO estimate"
    print(
        f"[flops] {name}: {gflops:.2f} GFLOP/call, {gbytes:.3f} GB accessed,"
        f" {out['params'] / 1e6:.2f} M params ({tag})",
        file=file, flush=True,
    )
    return out
