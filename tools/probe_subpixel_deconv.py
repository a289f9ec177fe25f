#!/usr/bin/env python
"""On-chip A/B + numeric check of the agg4d subpixel deconv lowering.

Runs the full stereo encoder (agg4d rank-4 domain) at bench shapes twice —
STEREOSCENE_AGG4D_SUBPIXEL=0 (lhs-dilated deconv) vs =1 (subpixel phase
channels) — asserting the outputs agree to lowering tolerance, then times
the full view stage under both to decide the default. The knob is read at
trace time, so the flag flips between jit cache entries via distinct
wrapper functions.

Usage: python tools/probe_subpixel_deconv.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tools.probe_view import (  # noqa: E402
    dispatch_overhead, make_variables, timeit,
)

from stereoscene_tpu.models.stereo_volume import GwcVolumeEncoder  # noqa: E402


def main():
    rng = np.random.RandomState(0)
    b, fh, fw, cin, d = 1, 48, 160, 640, 112
    feat_l = jnp.asarray(rng.randn(b, fh, fw, cin), jnp.bfloat16)
    feat_r = jnp.asarray(rng.randn(b, fh, fw, cin), jnp.bfloat16)
    mlp = jnp.asarray(rng.randn(b, 30), jnp.bfloat16)
    calib = jnp.asarray([380.0], jnp.float32)

    enc = GwcVolumeEncoder(max_disp=d, cam_channels=30)
    v = make_variables(enc, (feat_l, feat_r, mlp, mlp, calib))

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    outs = {}
    for flag in ("0", "1"):
        os.environ["STEREOSCENE_AGG4D_SUBPIXEL"] = flag

        def run(fl, fr, m, c, _f=flag):  # _f makes the jit key distinct
            o = enc.apply(v, fl, fr, m, m, c, train=False)
            return o["single_channel"].astype(jnp.float32)

        t = timeit(run, feat_l, feat_r, mlp, calib)
        outs[flag] = np.asarray(
            jax.jit(run)(feat_l, feat_r, mlp, calib)
        )
        print(f"stereo encoder subpixel={flag}: {t:.2f} ms", flush=True)

    diff = np.abs(outs["0"] - outs["1"]).max()
    # bf16 chain through 3 hourglasses: same math, different contraction
    # order; the softmax output is a probability in [0, 1]
    print(f"max |prob diff| = {diff:.3e}", flush=True)
    assert np.isfinite(outs["1"]).all()
    assert diff < 5e-2, diff
    print("SUBPIXEL_OK", flush=True)


if __name__ == "__main__":
    main()
