"""Benchmark: SSC inference frames/sec/chip on the active StereoScene config.

Runs the flagship model (EfficientNet-b7, 384x1280 stereo input, D=112,
128x128x16 voxel grid, upsampled 256x256x32 output — the reference's scored
configuration, stereoscene.py:57-126) in bf16 on one chip and reports
steady-state frames/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against an assumed reference throughput of 2.0
frames/sec on an A100 (the reference publishes no throughput numbers —
BASELINE.md — this figure is a conservative estimate for a GwcNet-style
stereo volume + B7 model at this resolution; the BASELINE.json target is
>= 5x that per v5e chip, i.e. vs_baseline >= 5).
"""

from __future__ import annotations

import json
import time

import numpy as np

ASSUMED_A100_FPS = 2.0


def main():
    import jax

    # persistent compile cache: the flagship graph takes minutes through the
    # remote-compile tunnel; cache hits make reruns near-instant
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
    from stereoscene_tpu.ops.resize import resize_trilinear

    # Flagship config at full active-resolution shapes.
    cfg = DetectorConfig()
    model = BEVDepthOccupancy(cfg=cfg)

    b = 1
    h, w = cfg.input_size
    rng = np.random.RandomState(0)
    eye3 = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 2, 3, 3))
    intrin = np.zeros((b, 2, 3, 4), np.float32)
    intrin[..., 0, 0] = 707.0
    intrin[..., 1, 1] = 707.0
    intrin[..., 0, 2] = w / 2.0
    intrin[..., 1, 2] = h / 2.0
    intrin[..., 2, 2] = 1.0
    r = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    batch = {
        "imgs": jnp.asarray(
            rng.randn(b, 2, h, w, 3).astype(np.float32), dtype=jnp.bfloat16
        ),
        "rots": jnp.asarray(np.broadcast_to(r, (b, 2, 3, 3)).copy()),
        "trans": jnp.zeros((b, 2, 3)),
        "intrins": jnp.asarray(intrin),
        "post_rots": jnp.asarray(eye3.copy()),
        "post_trans": jnp.zeros((b, 2, 3)),
        "bda": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy()
        ),
        "calib": jnp.asarray(np.full((b,), 707.0 * 0.54, np.float32)),
    }

    variables = jax.jit(lambda k: model.init(k, batch, train=False))(
        jax.random.PRNGKey(0)
    )
    # bf16 inference: cast float params; normalization/softmax islands inside
    # the model still compute in fp32
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables,
    )

    @jax.jit
    def forward(batch):
        out = model.apply(variables, batch, train=False)
        logits = out["output_voxels"][0].astype(jnp.float32)
        logits = resize_trilinear(logits, (256, 256, 32))
        return jnp.argmax(logits, axis=-1)

    # warmup / compile
    pred = forward(batch)
    jax.block_until_ready(pred)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = forward(batch)
    jax.block_until_ready(pred)
    dt = time.perf_counter() - t0

    fps = b * iters / dt
    print(
        json.dumps(
            {
                "metric": "SSC frames/sec/chip (SemanticKITTI 256x256x32)",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / ASSUMED_A100_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
