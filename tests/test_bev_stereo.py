import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.bev_stereo import (
    DepthNetStereo,
    StereoSimilarityNet,
    depth_distribution_from_gaussian,
    em_refine,
    gaussian_depth_candidates,
    homo_warp,
)


def test_depthnet_stereo_outputs():
    rng = np.random.RandomState(0)
    mod = DepthNetStereo(mid_channels=16, context_channels=8,
                         depth_channels=12, cam_channels=27, num_ranges=4)
    x = jnp.asarray(rng.randn(1, 8, 16, 16).astype(np.float32))
    mlp = jnp.asarray(rng.randn(1, 27).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, mlp)
    out = mod.apply(variables, x, mlp)
    assert out["context"].shape == (1, 8, 16, 8)
    assert out["mono_depth"].shape == (1, 8, 16, 12)
    assert out["mu"].shape == (1, 32, 64, 4)  # 4x upsampled


def test_homo_warp_identity():
    """With identity key->src transform and equal intrinsics, the warp at any
    depth returns the source feature at the same pixel."""
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 8, 12, 4).astype(np.float32))
    k = np.array([[10.0, 0, 6], [0, 10.0, 4], [0, 0, 1]], np.float32)
    intrin = jnp.asarray(k[None])
    key2src = jnp.broadcast_to(jnp.eye(4), (1, 4, 4))
    depth = jnp.full((1, 3, 8, 12), 5.0)
    warped = homo_warp(feat, key2src, intrin, intrin, depth)
    assert warped.shape == (1, 3, 8, 12, 4)
    for ki in range(3):
        np.testing.assert_allclose(
            np.asarray(warped[0, ki]), np.asarray(feat[0]), atol=1e-3
        )


def test_homo_warp_translation():
    """Source camera shifted along x: warped pixels come from shifted
    columns; far depths shift less (parallax)."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(1, 6, 20, 2).astype(np.float32))
    k = np.array([[10.0, 0, 10], [0, 10.0, 3], [0, 0, 1]], np.float32)
    intrin = jnp.asarray(k[None])
    key2src = np.eye(4, dtype=np.float32)
    key2src[0, 3] = -1.0  # src camera 1m to the right -> pixel shift -fx/z
    key2src = jnp.asarray(key2src[None])
    depth = jnp.stack(
        [jnp.full((1, 6, 20), 2.0), jnp.full((1, 6, 20), 10.0)], axis=1
    )
    warped = homo_warp(feat, key2src, intrin, intrin, depth)
    # at depth 2: disparity = fx * 1 / 2 = 5 px; at depth 10: 1 px
    np.testing.assert_allclose(
        np.asarray(warped[0, 0, :, 6]), np.asarray(feat[0, :, 1]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(warped[0, 1, :, 6]), np.asarray(feat[0, :, 5]), atol=1e-3
    )


def test_em_refine_converges_to_peak():
    b, k, h, w = 1, 9, 2, 2
    candidates = jnp.broadcast_to(
        jnp.linspace(2.0, 10.0, k)[None, :, None, None], (b, k, h, w)
    )
    scores = jnp.where(
        jnp.arange(k)[None, :, None, None] == 6, 8.0, 0.0
    )  # peak at candidate 6 (depth 8.0)
    mu0 = jnp.full((b, h, w), 5.0)
    sigma0 = jnp.full((b, h, w), 3.0)
    mu, sigma = em_refine(mu0, sigma0, candidates, scores, iters=2)
    assert abs(float(mu[0, 0, 0]) - 8.0) < 0.5
    assert float(sigma[0, 0, 0]) < 3.0


def test_distribution_normalized():
    mu = jnp.full((1, 4, 4), 5.0)
    sigma = jnp.full((1, 4, 4), 1.0)
    dist = depth_distribution_from_gaussian(mu, sigma, (2.0, 10.0, 0.5), 16)
    np.testing.assert_allclose(
        np.asarray(dist.sum(axis=1)), 1.0, atol=1e-5
    )
    # peak bin at depth 5.0 -> index 6
    assert int(dist[0, :, 0, 0].argmax()) == 6


def test_similarity_net():
    rng = np.random.RandomState(3)
    key = jnp.asarray(rng.randn(1, 4, 6, 16).astype(np.float32))
    warped = jnp.asarray(rng.randn(1, 5, 4, 6, 16).astype(np.float32))
    mod = StereoSimilarityNet(num_groups=4)
    variables = mod.init(jax.random.PRNGKey(0), key, warped)
    scores = mod.apply(variables, key, warped)
    assert scores.shape == (1, 5, 4, 6)
