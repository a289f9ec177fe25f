#!/usr/bin/env python
"""On-chip probe: Pallas im2col conv3d vs XLA conv3d / zpack at the
hourglass cost-volume shapes."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import timeit, dispatch_overhead  # noqa: E402
from stereoscene_tpu.ops.pallas_conv3d import (  # noqa: E402
    conv3d_s1_pallas, _plain_conv3d_s1,
)
from stereoscene_tpu.models.layers import _zpack_s1_core  # noqa: E402

SHAPES = [
    ("conv2 64->64 @56x24x80", (1, 56, 24, 80, 64), 64),
    ("conv4 128->128 @28x12x40", (1, 28, 12, 40, 128), 128),
    ("dres 32->32 @112x48x160", (1, 112, 48, 160, 32), 32),
    ("classif 32->32 @112x48x160", (1, 112, 48, 160, 32), 32),
]


def main():
    rng = np.random.RandomState(0)
    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)
    for name, xshape, co in SHAPES:
        ci = xshape[-1]
        x = jnp.asarray(rng.randn(*xshape), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, 3, ci, co) * 0.1, jnp.bfloat16)
        gflop = 2 * 27 * ci * co * np.prod(xshape[1:4]) / 1e9

        ref = np.asarray(_plain_conv3d_s1(x, w), np.float32)
        got = np.asarray(conv3d_s1_pallas(x, w), np.float32)
        err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
        print(f"# {name}: rel err pallas vs xla {err:.2e}", flush=True)

        t_x = timeit(_plain_conv3d_s1, x, w)
        t_p = timeit(lambda a, b: conv3d_s1_pallas(a, b), x, w)
        t_z = timeit(_zpack_s1_core, x, w)
        print(
            f"{name}: xla {t_x:.2f} ms ({gflop / t_x:.1f} TF/s)  "
            f"pallas {t_p:.2f} ms ({gflop / t_p:.1f} TF/s)  "
            f"zpack {t_z:.2f} ms ({gflop / t_z:.1f} TF/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
