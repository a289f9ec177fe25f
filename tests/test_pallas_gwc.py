"""Fused Pallas gwc+warp kernel vs the unfused ops/gwc.py pair.

Interpret mode (CPU); exactness covers the validity mask (w - i < 0), the
warp's zero padding outside [0, D-1], and both boundary cells of the lerp.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stereoscene_tpu.geometry import disparity_positions
from stereoscene_tpu.ops.gwc import (
    groupwise_correlation_volume,
    warp_disparity_to_depth,
)
from stereoscene_tpu.ops.pallas_gwc import fused_gwc_warp


def _reference(left, right, positions, max_disp, num_groups):
    vol = groupwise_correlation_volume(left, right, max_disp, num_groups)
    return warp_disparity_to_depth(vol, positions)


@pytest.mark.parametrize("calib", [707.0 * 0.54, 90.0, 20.0])
def test_fused_matches_unfused(calib):
    rng = np.random.RandomState(0)
    b, h, w, c, d, g = 2, 8, 40, 16, 16, 8
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    pos = disparity_positions(jnp.full((b,), calib, jnp.float32), d)

    want = _reference(left, right, pos, d, g)
    got = fused_gwc_warp(left, right, pos, d, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_boundary_positions():
    """Positions straddling -1, 0, D-1 and D exercise every clip branch."""
    rng = np.random.RandomState(1)
    b, h, w, c, d, g = 1, 8, 24, 8, 8, 4
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    pos = jnp.asarray(
        [[-1.5, -0.4, 0.0, 0.6, 3.5, 6.9, 7.0, 8.2]], jnp.float32
    )

    want = _reference(left, right, pos, d, g)
    got = fused_gwc_warp(left, right, pos, d, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_non_multiple_ktile():
    """K not divisible by K_TILE falls back to k_tile = 1."""
    rng = np.random.RandomState(2)
    b, h, w, c, d, g = 1, 4, 16, 8, 5, 4
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    pos = disparity_positions(jnp.full((b,), 12.0, jnp.float32), d)

    want = _reference(left, right, pos, d, g)
    got = fused_gwc_warp(left, right, pos, d, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_custom_vjp_matches_unfused_grads():
    import jax

    rng = np.random.RandomState(4)
    b, h, w, c, d, g = 1, 6, 20, 8, 8, 4
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    pos = disparity_positions(jnp.full((b,), 14.0, jnp.float32), d)

    def loss_fused(l, r):
        out = fused_gwc_warp(l, r, pos, d, g, jnp.float32, True)
        return jnp.sum(out * out)

    def loss_ref(l, r):
        return jnp.sum(_reference(l, r, pos, d, g) ** 2)

    gl, gr = jax.grad(loss_fused, argnums=(0, 1))(left, right)
    wl, wr = jax.grad(loss_ref, argnums=(0, 1))(left, right)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(wl),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                               rtol=1e-4, atol=1e-4)


def test_fused_bf16_output_dtype():
    rng = np.random.RandomState(3)
    b, h, w, c, d, g = 1, 8, 16, 8, 8, 4
    left = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    right = jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
    pos = disparity_positions(jnp.full((b,), 14.0, jnp.float32), d)

    got = fused_gwc_warp(left, right, pos, d, g, interpret=True)
    assert got.dtype == jnp.bfloat16
    want = _reference(left, right, pos, d, g).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got).astype(np.float32), np.asarray(want),
        rtol=2e-2, atol=2e-2,
    )
