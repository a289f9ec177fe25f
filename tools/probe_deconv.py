#!/usr/bin/env python
"""On-chip microbenchmark: transposed-conv lowerings at hourglass shapes.

Chained-dependency timing (axon relay lies otherwise — see PERF.md).
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def timeit(fn, x, iters=30):
    fn = jax.jit(fn)
    out = fn(x)
    jax.block_until_ready(out)

    def loop(n):
        feedback = jnp.zeros((), x.dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(x + feedback)
            feedback = (jnp.max(jnp.abs(out.astype(jnp.float32))) * 0).astype(x.dtype)
        _ = float(feedback)
        return (time.perf_counter() - t0) / n * 1000

    loop(8)
    return loop(iters)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    cases = [
        # (name, in spatial, cin, cout)  — hourglass decoder shapes
        ("deconv6 112x48x160", (56, 24, 80), 64, 32),
        ("deconv5 56x24x80", (28, 12, 40), 128, 64),
    ]
    for name, sp, cin, cout in cases:
        x = jnp.asarray(rng.randn(1, *sp, cin), dt)
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout), dt)
        spec = ("NDHWC", "DHWIO", "NDHWC")

        def dilated(x, k=k):
            flipped = jnp.flip(k, axis=(0, 1, 2))
            return jax.lax.conv_general_dilated(
                x, flipped, (1, 1, 1), [(1, 2)] * 3,
                lhs_dilation=(2, 2, 2), dimension_numbers=spec)

        from stereoscene_tpu.models.layers import _subpixel_deconv_k3s2

        def subpix(x, k=k):
            return _subpixel_deconv_k3s2(x, k, 3, spec, dt)

        def subpix_nodts(x, k=k):
            # conv only, skip depth-to-space: isolates relayout cost
            import itertools
            taps = {0: {0: 1, 1: None}, 1: {0: 2, 1: 0}}
            blocks = []
            zero = jnp.zeros((cin, cout), k.dtype)
            for r in itertools.product((0, 1), repeat=3):
                for w in itertools.product((0, 1), repeat=3):
                    kk = tuple(taps[r[d]][w[d]] for d in range(3))
                    blocks.append(zero if None in kk else k[kk])
            w_aug = jnp.stack(blocks, 0).reshape(8, 2, 2, 2, cin, cout)
            w_aug = w_aug.transpose(1, 2, 3, 4, 0, 5).reshape(2, 2, 2, cin, 8 * cout)
            return jax.lax.conv_general_dilated(
                x, w_aug, (1, 1, 1), [(0, 1)] * 3, dimension_numbers=spec)

        t_d = timeit(dilated, x)
        t_s = timeit(subpix, x)
        t_n = timeit(subpix_nodts, x)
        print(f"{name}: dilated {t_d:.2f}ms  subpixel {t_s:.2f}ms  "
              f"subpixel-conv-only {t_n:.2f}ms", flush=True)

    # plain conv3d throughput vs channel count at the full volume
    for cin, cout, sp in [(32, 32, (112, 48, 160)), (64, 64, (56, 24, 80)),
                          (128, 128, (28, 12, 40)), (2, 32, (112, 48, 160)),
                          (32, 1, (112, 48, 160))]:
        x = jnp.asarray(rng.randn(1, *sp, cin), dt)
        k = jnp.asarray(rng.randn(3, 3, 3, cin, cout), dt)

        def conv(x, k=k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

        t = timeit(conv, x)
        flops = 2 * 27 * cin * cout * int(np.prod(sp))
        print(f"conv3d {cin}->{cout} @{sp}: {t:.2f}ms  "
              f"{flops / t / 1e9:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
