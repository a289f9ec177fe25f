"""Shifted depthwise conv must match XLA's grouped-conv depthwise exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from stereoscene_tpu.models.efficientnet import depthwise_conv_shifted


def _ref_depthwise(x, kernel, stride):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding="SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_depthwise_shifted_matches_xla():
    rng = np.random.RandomState(0)
    for (h, w, c, k, s) in [(9, 13, 8, 3, 1), (10, 14, 4, 5, 2),
                            (7, 7, 16, 3, 2), (12, 20, 8, 5, 1)]:
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        kernel = jnp.asarray(rng.randn(k, k, 1, c).astype(np.float32))
        ours = depthwise_conv_shifted(x, kernel, s)
        ref = _ref_depthwise(x, kernel, s)
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-4, atol=1e-5
        )
