#!/usr/bin/env python
"""On-chip probe: stage_bev breakdown (3D encoder / FPN3D+head / trilinear
upsample+argmax) and cheaper upsample formulations.

The bench's stage_bev is ~13.7 ms; the 2x trilinear upsample to
256x256x32x20 f32 writes 167 MB and the argmax reads it back — worth
checking whether jax.image.resize's gather-style lowering is the cost and
whether an exact phase-decomposed 2x lerp (static shift algebra, no
gathers) is faster.

Usage: python tools/probe_bev.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import dispatch_overhead, make_variables, timeit  # noqa: E402


def upsample2x_phase(x):
    """Exact 2x trilinear with half-pixel centers as static shift algebra.

    align_corners=False at scale 2: out[2i] = 0.25*in[i-1] + 0.75*in[i],
    out[2i+1] = 0.75*in[i] + 0.25*in[i+1], edges clamped — per axis, so
    the 3D upsample is three sequential axis lerps with no gather ops.
    """
    for ax in range(1, 4):
        lo = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 0, 1, axis=ax),
             jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)], axis=ax
        )
        hi = jnp.concatenate(
            [jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax),
             jax.lax.slice_in_dim(x, x.shape[ax] - 1, x.shape[ax], axis=ax)],
            axis=ax,
        )
        even = 0.25 * lo + 0.75 * x
        odd = 0.75 * x + 0.25 * hi
        # interleave even/odd along ax: stack on a new axis right after ax
        st = jnp.stack([even, odd], axis=ax + 1)
        x = st.reshape(
            x.shape[:ax] + (2 * x.shape[ax],) + x.shape[ax + 1:]
        )
    return x


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16
    B = 1
    X, Y, Z, C = 128, 128, 16, 128

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    from stereoscene_tpu.models.detector import (
        BEVDepthOccupancy, DetectorConfig,
    )
    from stereoscene_tpu.ops.resize import resize_trilinear

    cfg = DetectorConfig(backbone_with_cp=False)
    model = BEVDepthOccupancy(cfg=cfg)
    vox = jnp.asarray(rng.randn(B, X, Y, Z, cfg.numC_Trans), dt)
    variables = make_variables(model, (vox,), method="bev_encode")

    def encode_only(v):
        head_out, _ = model.apply(variables, v, method="bev_encode")
        return head_out["output_voxels"][0]

    t_enc = timeit(encode_only, vox)
    print(f"bev_encode (3D resnet+fpn+head): {t_enc:.2f} ms", flush=True)

    logits = jnp.asarray(rng.randn(B, X, Y, Z, 20), jnp.float32)

    def up_argmax(lg):
        return jnp.argmax(resize_trilinear(lg, (256, 256, 32)), axis=-1)

    t = timeit(up_argmax, logits)
    print(f"resize_trilinear f32 + argmax: {t:.2f} ms", flush=True)

    def up_argmax_phase(lg):
        return jnp.argmax(upsample2x_phase(lg), axis=-1)

    # correctness check vs jax.image.resize
    a = np.asarray(jax.jit(up_argmax)(logits))
    b = np.asarray(jax.jit(up_argmax_phase)(logits))
    agree = float((a == b).mean())
    ref = np.asarray(jax.jit(lambda lg: resize_trilinear(lg, (256, 256, 32)))(logits))
    got = np.asarray(jax.jit(upsample2x_phase)(logits))
    err = float(np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9))
    print(f"phase-2x exactness: max rel err {err:.2e}, argmax agree {agree:.6f}",
          flush=True)

    t = timeit(up_argmax_phase, logits)
    print(f"phase-2x lerp f32 + argmax: {t:.2f} ms", flush=True)

    def up_argmax_phase_bf16(lg):
        return jnp.argmax(upsample2x_phase(lg.astype(jnp.bfloat16)), axis=-1)

    t = timeit(up_argmax_phase_bf16, logits)
    print(f"phase-2x lerp bf16 + argmax: {t:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
