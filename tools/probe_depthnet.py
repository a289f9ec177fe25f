#!/usr/bin/env python
"""On-chip probe: DepthNet submodule timing (reduce conv / blocks / ASPP /
DCN / heads) to locate the stage's cost. Usage: python tools/probe_depthnet.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import timeit, dispatch_overhead, make_variables  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    B, H, W, C = 1, 48, 160, 640
    x = jnp.asarray(rng.randn(B, H, W, C), dt)
    mlp = jnp.asarray(rng.randn(B, 30), jnp.float32)
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    from stereoscene_tpu.models.depth_net import (
        ASPP, BasicBlock2d, DeformConvPack, DepthNet,
    )

    m = DepthNet(mid_channels=C, context_channels=128, depth_channels=112,
                 cam_channels=30)
    v = make_variables(m, (x, mlp))
    print(f"DepthNet total: {timeit(lambda a: m.apply(v, a, mlp), x):.2f} ms",
          flush=True)

    bm = BasicBlock2d(C)
    bv = make_variables(bm, (x,))
    print(f"  one BasicBlock: {timeit(lambda a: bm.apply(bv, a), x):.2f} ms",
          flush=True)

    am = ASPP(C)
    av = make_variables(am, (x,))
    print(f"  ASPP: {timeit(lambda a: am.apply(av, a), x):.2f} ms", flush=True)

    dm = DeformConvPack(C)
    dv = make_variables(dm, (x,))
    print(f"  DCN: {timeit(lambda a: dm.apply(dv, a), x):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
