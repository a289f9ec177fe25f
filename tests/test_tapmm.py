"""Tap-matmul lowering of the ASPP dilated convs: exactness + param tree."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from stereoscene_tpu.models.depth_net import ASPP, _TapMatmulDilatedConv
from flax import linen as nn


def test_tapmm_matches_dilated_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 20, 16), jnp.float32)
    for d in (2, 6):
        m = _TapMatmulDilatedConv(24, dilation=d)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = nn.Conv(24, (3, 3), padding=[(d, d)] * 2, kernel_dilation=(d, d),
                      use_bias=False)
        got = m.apply(v, x)
        want = ref.apply({"params": {"kernel": v["params"]["kernel"]}}, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_aspp_gate_same_params_same_output():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 24, 40, 32), jnp.float32)
    try:
        os.environ["STEREOSCENE_ASPP_TAPMM"] = "0"
        m0 = ASPP(32)
        v = m0.init(jax.random.PRNGKey(0), x)
        base = m0.apply(v, x)
        os.environ["STEREOSCENE_ASPP_TAPMM"] = "1"
        m1 = ASPP(32)
        v1 = m1.init(jax.random.PRNGKey(0), x)
        # identical param trees (checkpoint compatibility)
        assert jax.tree.structure(v) == jax.tree.structure(v1)
        got = m1.apply(v, x)
    finally:
        os.environ.pop("STEREOSCENE_ASPP_TAPMM", None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
