"""Pallas splat kernel parity vs the XLA scatter path (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.ops.pallas_splat import pallas_lift_splat
from stereoscene_tpu.ops.voxel_pool import lift_splat


def _case(b=1, d=6, fh=8, fw=16, c=128, grid=(16, 16, 4), seed=0):
    rng = np.random.RandomState(seed)
    nvox = grid[0] * grid[1] * grid[2]
    depth_prob = jax.nn.softmax(
        jnp.asarray(rng.randn(b, d, fh, fw).astype(np.float32)), axis=1
    )
    feat = jnp.asarray(rng.randn(b, fh, fw, c).astype(np.float32))
    ranks = rng.randint(0, nvox, size=(b, d * fh * fw)).astype(np.int32)
    # sprinkle some out-of-bounds sentinels
    ranks[rng.rand(*ranks.shape) < 0.1] = nvox
    return depth_prob, feat, jnp.asarray(ranks), grid


def test_pallas_splat_matches_scatter():
    depth_prob, feat, ranks, grid = _case()
    ref = lift_splat(depth_prob, feat, ranks, grid)
    out = pallas_lift_splat(depth_prob, feat, ranks, grid, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_pallas_splat_batch2():
    depth_prob, feat, ranks, grid = _case(b=2, seed=3)
    ref = lift_splat(depth_prob, feat, ranks, grid)
    out = pallas_lift_splat(depth_prob, feat, ranks, grid, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_pallas_splat_gradients_match():
    depth_prob, feat, ranks, grid = _case(d=4, fh=4, fw=8, c=128, seed=5)

    def loss_pallas(dp, ft):
        out = pallas_lift_splat(dp, ft, ranks, grid, interpret=True)
        return jnp.sum(out ** 2)

    def loss_ref(dp, ft):
        out = lift_splat(dp, ft, ranks, grid)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(depth_prob, feat)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(depth_prob, feat)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
