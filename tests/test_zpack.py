"""The MXU-lane-packing conv3d lowerings must match XLA's direct conv3d
bit-for-bit in tap algebra (same FLOPs, same math, only the schedule
differs): stride-1 depth-tap folding (_ZPackConv3d) and the stride-2
depth-parity phase split (_ZPackConv3dS2)."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoscene_tpu.models.layers import Conv3d, _ZPackConv3dS2


def _direct_conv3d(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,) * 3,
        padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def test_zpack_s2_matches_direct():
    rng = np.random.RandomState(0)
    for (d, h, w, ci, co) in [(8, 6, 10, 4, 8), (6, 8, 8, 8, 3),
                              (4, 4, 4, 2, 5)]:
        x = jnp.asarray(rng.randn(2, d, h, w, ci).astype(np.float32))
        mod = _ZPackConv3dS2(features=co, use_bias=True)
        variables = mod.init(jax.random.PRNGKey(0), x)
        ours = mod.apply(variables, x)
        kernel = variables["params"]["kernel"]
        bias = variables["params"]["bias"]
        ref = _direct_conv3d(x, kernel, 2) + bias
        assert ours.shape == ref.shape == (2, d // 2, h // 2, w // 2, co)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_conv3d_s2_gate_env(monkeypatch):
    """With STEREOSCENE_ZPACK_S2=1 the Conv3d wrapper must produce the
    identical param tree (Conv_0/kernel) and identical outputs."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 6, 10, 4).astype(np.float32))

    def build_apply():
        mod = Conv3d(8, 3, stride=2, padding=1)
        v = mod.init(jax.random.PRNGKey(0), x)
        return mod.apply(v, x), jax.tree_util.tree_structure(v)

    monkeypatch.delenv("STEREOSCENE_ZPACK_S2", raising=False)
    y_off, tree_off = build_apply()
    monkeypatch.setenv("STEREOSCENE_ZPACK_S2", "1")
    y_on, tree_on = build_apply()
    assert tree_off == tree_on
    np.testing.assert_allclose(
        np.asarray(y_off), np.asarray(y_on), rtol=1e-4, atol=1e-5
    )


def test_conv3d_s2_gate_skips_odd_shapes(monkeypatch):
    """Odd spatial dims must fall back to the direct lowering (the phase
    split assumes even D/H/W)."""
    monkeypatch.setenv("STEREOSCENE_ZPACK_S2", "1")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 7, 6, 10, 4).astype(np.float32))
    mod = Conv3d(8, 3, stride=2, padding=1)
    v = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(v, x)
    kernel = v["params"]["Conv_0"]["kernel"]
    bias = v["params"]["Conv_0"]["bias"]
    ref = _direct_conv3d(x, kernel, 2) + bias
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_zpack_custom_vjp_grads_match_plain_conv3d():
    """The zpack backward routes through the plain conv3d VJP (the zpack
    autodiff backward is miscompiled by XLA:TPU — see layers._make_zpack_op);
    both input and kernel grads must equal the plain lowering's."""
    from stereoscene_tpu.models.layers import (
        _plain_conv3d, _zpack_s1, _zpack_s2,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 4).astype(np.float32))
    w = jnp.asarray(0.2 * rng.randn(3, 3, 3, 4, 8).astype(np.float32))

    for op, stride in ((_zpack_s1, 1), (_zpack_s2, 2)):
        def loss(fn, xx, ww):
            return jnp.sum(fn(xx, ww) ** 2)

        gx, gw = jax.grad(lambda a, b: loss(op, a, b), argnums=(0, 1))(x, w)
        px, pw = jax.grad(
            lambda a, b: loss(lambda xx, ww: _plain_conv3d(xx, ww, stride),
                              a, b), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(px),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(pw),
                                   rtol=1e-4, atol=1e-4)


def test_zpack_core_bwd_grads_match_plain_conv3d(monkeypatch):
    """STEREOSCENE_ZPACK_BWD=core (the round-5 training default candidate:
    autodiff VJP of the zpack lowering itself, behind the same barriers +
    f32 island) is mathematically identical to the plain-conv3d VJP — both
    grads must match to accumulation noise."""
    from stereoscene_tpu.models.layers import (
        _plain_conv3d, _zpack_s1, _zpack_s2, _dpack_s1, _dpack_s2,
    )

    monkeypatch.setenv("STEREOSCENE_ZPACK_BWD", "core")
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 4).astype(np.float32))
    w = jnp.asarray(0.2 * rng.randn(3, 3, 3, 4, 8).astype(np.float32))

    for op, stride in ((_zpack_s1, 1), (_zpack_s2, 2),
                       (_dpack_s1, 1), (_dpack_s2, 2)):
        def loss(fn, xx, ww):
            return jnp.sum(fn(xx, ww) ** 2)

        gx, gw = jax.grad(lambda a, b: loss(op, a, b), argnums=(0, 1))(x, w)
        px, pw = jax.grad(
            lambda a, b: loss(lambda xx, ww: _plain_conv3d(xx, ww, stride),
                              a, b), argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(px),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(pw),
                                   rtol=1e-4, atol=1e-4)


def test_dpack_matches_direct():
    """The input-side depth fold (layers._dpack_s1_core/_dpack_s2_core) is
    exact tap algebra vs the direct conv3d at both strides."""
    import numpy as np
    import jax.numpy as jnp
    from stereoscene_tpu.models.layers import (
        _plain_conv3d, _dpack_s1_core, _dpack_s2_core,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 6, 10, 5), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 5, 7) * 0.2, jnp.float32)
    for core, stride in ((_dpack_s1_core, 1), (_dpack_s2_core, 2)):
        ref = _plain_conv3d(x, w, stride)
        got = core(x, w)
        assert got.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
        )
