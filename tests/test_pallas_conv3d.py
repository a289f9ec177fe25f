"""Parity tests for the Pallas im2col conv3d (ops/pallas_conv3d.py).

The kernel runs in interpret mode on the CPU test platform; exactness is
vs jax.lax.conv_general_dilated at several shapes, including a W extent
off the 16-row sublane tile (exercises the host-side W pad + slice) and
odd channel counts (exercises the 128-lane pad).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereoscene_tpu.ops.pallas_conv3d import (
    conv3d_s1_pallas,
    _plain_conv3d_s1,
)


@pytest.mark.parametrize(
    "shape,co",
    [
        ((1, 6, 8, 10, 4), 6),     # tiny, W pad path
        ((2, 4, 4, 16, 8), 8),     # batched, W aligned
        ((1, 5, 4, 40, 12), 16),   # W=40 -> padded to 48
    ],
)
def test_forward_parity(shape, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, shape[-1], co) * 0.2, jnp.float32)
    ref = _plain_conv3d_s1(x, w)
    got = conv3d_s1_pallas(x, w, True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_gradient_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 6, 10, 4), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4, 6) * 0.2, jnp.float32)

    def loss_p(x, w):
        return jnp.sum(jnp.sin(conv3d_s1_pallas(x, w, True)))

    def loss_r(x, w):
        return jnp.sum(jnp.sin(_plain_conv3d_s1(x, w)))

    gx, gw = jax.grad(loss_p, (0, 1))(x, w)
    rx, rw = jax.grad(loss_r, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)


def test_convnd_gate_off_by_default(monkeypatch):
    """The ConvNd dispatch only routes to the Pallas kernel when the env
    gate is explicitly opted in (it measured slower in-graph)."""
    monkeypatch.delenv("STEREOSCENE_PALLAS_CONV3D", raising=False)
    from stereoscene_tpu.models.layers import _pallas_conv3d_enabled

    assert not _pallas_conv3d_enabled()
