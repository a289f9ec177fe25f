import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.voxel_encoder import (
    DenseSparseEncoder,
    DenseUNet3D,
    voxelize_points,
)


def test_voxelize_points_mean():
    pts = jnp.asarray(
        [[0.5, 0.5, 0.5], [0.6, 0.4, 0.5], [3.5, 3.5, 1.5], [9.0, 0.0, 0.0]]
    )
    feats = jnp.asarray([[2.0], [4.0], [6.0], [100.0]])
    valid = jnp.asarray([True, True, True, True])
    grid = voxelize_points(pts, feats, valid, (4, 4, 2), [0, 0, 0, 4, 4, 2])
    assert grid.shape == (4, 4, 2, 1)
    np.testing.assert_allclose(float(grid[0, 0, 0, 0]), 3.0)  # mean(2, 4)
    np.testing.assert_allclose(float(grid[3, 3, 1, 0]), 6.0)
    # out-of-range point dropped
    np.testing.assert_allclose(float(jnp.sum(grid)), 9.0)


def test_dense_sparse_encoder_shapes():
    model = DenseSparseEncoder(
        base_channels=8, encoder_channels=(8, 16), out_channels=16,
        norm_groups=4,
    )
    x = jnp.zeros((1, 16, 16, 8, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 8, 8, 4, 16)


def test_dense_unet_shapes():
    model = DenseUNet3D(channels=(8, 16, 32), norm_groups=4)
    x = jnp.zeros((1, 16, 16, 8, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 16, 16, 8, 8)
