#!/usr/bin/env python
"""On-chip probe: Hourglass3D lowering strategies at the flagship cost-volume
shape [1, 112, 48, 160, 32] (3 hourglasses = ~25 ms of the 94 ms budget).

Variants toggle the layers.py env gates per-trace:
  base               current default lowering
  dpack              STEREOSCENE_DPACK=1       (interior convs -> 2D, taps in Cin)
  dpack+zs2          + STEREOSCENE_ZPACK_S2=1  (strided convs -> parity phases)
  dpack+dphase       + STEREOSCENE_DPHASE_DECONV=1 (deconvs -> d-phase 2D)
  all                everything on

Usage: python tools/probe_hourglass.py [variant ...]
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

VARIANTS = {
    "base": {},
    "dpack": {"STEREOSCENE_DPACK": "1"},
    "dpack+zs2": {"STEREOSCENE_DPACK": "1", "STEREOSCENE_ZPACK_S2": "1"},
    "dpack+dphase": {"STEREOSCENE_DPACK": "1",
                     "STEREOSCENE_DPHASE_DECONV": "1"},
    "zs2": {"STEREOSCENE_ZPACK_S2": "1"},
    "dphase": {"STEREOSCENE_DPHASE_DECONV": "1"},
    "all": {"STEREOSCENE_DPACK": "1", "STEREOSCENE_ZPACK_S2": "1",
            "STEREOSCENE_DPHASE_DECONV": "1"},
    "zmax192": {"STEREOSCENE_ZPACK_MAX": "192"},
    "zmax384": {"STEREOSCENE_ZPACK_MAX": "384"},
    "zmax384+zs2": {"STEREOSCENE_ZPACK_MAX": "384",
                    "STEREOSCENE_ZPACK_S2": "1"},
    "zmax384+zs2+dphase": {"STEREOSCENE_ZPACK_MAX": "384",
                           "STEREOSCENE_ZPACK_S2": "1",
                           "STEREOSCENE_DPHASE_DECONV": "1"},
}

GATES = ["STEREOSCENE_DPACK", "STEREOSCENE_ZPACK_S2",
         "STEREOSCENE_DPHASE_DECONV", "STEREOSCENE_SUBPIXEL_DECONV",
         "STEREOSCENE_ZPACK_MAX"]


def main():
    which = sys.argv[1:] or ["base", "dpack", "dpack+zs2", "dpack+dphase",
                             "all"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 112, 48, 160, 32), jnp.bfloat16)
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    ref_out = None
    for name in which:
        env = VARIANTS[name]
        for g in GATES:
            os.environ.pop(g, None)
        os.environ.update(env)
        from stereoscene_tpu.models.stereo_volume import Hourglass3D
        model = Hourglass3D(32)
        variables = make_variables(model, (x,))

        def fwd(x_, variables=variables, model=model):
            return model.apply(variables, x_)

        out = jax.jit(fwd)(x)
        jax.block_until_ready(out)
        if ref_out is None:
            ref_out = np.asarray(out, np.float32)
        else:
            got = np.asarray(out, np.float32)
            err = np.abs(got - ref_out).max() / (np.abs(ref_out).max() + 1e-9)
            print(f"#   {name}: rel err vs base {err:.2e}", flush=True)
        t = timeit(fwd, x)
        print(f"hourglass[{name}]: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
