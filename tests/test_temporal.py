import numpy as np
import jax.numpy as jnp

from stereoscene_tpu.models.temporal import (
    fuse_temporal_voxel_features,
    relative_bev_transform,
    shift_voxel_feature,
)


def test_relative_transform_identity():
    b = 2
    r = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    t = jnp.zeros((b, 3))
    tf = relative_bev_transform(r, t, r, t)
    np.testing.assert_allclose(np.asarray(tf), np.broadcast_to(np.eye(3), (b, 3, 3)), atol=1e-5)


def test_relative_transform_translation():
    b = 1
    r = jnp.broadcast_to(jnp.eye(3), (b, 3, 3))
    t0 = jnp.zeros((b, 3))
    t1 = jnp.asarray([[2.0, 0.0, 0.0]])  # adjacent cam sits 2m ahead in x
    tf = np.asarray(relative_bev_transform(r, t0, r, t1))
    # current-lidar point maps to adjacent-lidar coords shifted by -2 in x
    np.testing.assert_allclose(tf[0] @ np.array([0, 0, 1.0]), [-2, 0, 1], atol=1e-5)


def test_shift_identity_is_noop():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 8, 8, 2, 3).astype(np.float32))
    dx = np.array([1.0, 1.0, 1.0], np.float32)
    bx = np.array([0.5, 0.5, 0.5], np.float32)
    tf = jnp.broadcast_to(jnp.eye(3), (1, 3, 3))
    out = shift_voxel_feature(feat, tf, dx, bx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-4)


def test_shift_integer_translation():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(1, 8, 8, 1, 2).astype(np.float32))
    dx = np.array([1.0, 1.0, 1.0], np.float32)
    bx = np.array([0.5, 0.5, 0.5], np.float32)
    # transform: current x -> adjacent x - 2 (ego moved +2 in x)
    tf = jnp.asarray(np.array([[[1, 0, -2], [0, 1, 0], [0, 0, 1]]], np.float32))
    out = np.asarray(shift_voxel_feature(feat, tf, dx, bx))
    ref = np.asarray(feat)
    # cell i samples source cell i-2
    np.testing.assert_allclose(out[0, 2:], ref[0, :-2], atol=1e-4)
    np.testing.assert_allclose(out[0, :2], 0.0, atol=1e-6)


def test_fuse_concat_shapes():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(2, 4, 4, 2, 3).astype(np.float32))
    batch = {
        "rots": jnp.broadcast_to(jnp.eye(3), (2, 2, 3, 3)),
        "trans": jnp.zeros((2, 2, 3)),
    }
    out = fuse_temporal_voxel_features(
        feat, feat, batch, batch,
        np.ones(3, np.float32), np.zeros(3, np.float32),
    )
    assert out.shape == (2, 4, 4, 2, 6)
