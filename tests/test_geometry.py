import numpy as np
import jax.numpy as jnp

from stereoscene_tpu import geometry


def _rand_rot(rng):
    a, b, c = rng.uniform(-0.3, 0.3, 3)

    def rx(t):
        return np.array(
            [[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]]
        )

    def rz(t):
        return np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )

    return (rz(a) @ rx(b) @ rz(c)).astype(np.float32)


def test_gen_dx_bx_active_config():
    dx, bx, nx = geometry.gen_dx_bx(
        [0, 51.2, 0.4], [-25.6, 25.6, 0.4], [-2, 4.4, 0.4]
    )
    np.testing.assert_allclose(dx, [0.4, 0.4, 0.4], rtol=1e-6)
    np.testing.assert_allclose(bx, [0.2, -25.4, -1.8], rtol=1e-5)
    np.testing.assert_array_equal(nx, [128, 128, 16])


def test_frustum_shape_and_bins():
    fr = geometry.create_frustum((384, 1280), 8, (2.0, 58.0, 0.5))
    assert fr.shape == (112, 48, 160, 3)
    # depth axis
    np.testing.assert_allclose(fr[:, 0, 0, 2], np.arange(2.0, 58.0, 0.5))
    # pixel coordinates span the augmented input image
    assert fr[0, 0, 0, 0] == 0 and fr[0, 0, -1, 0] == 1279
    assert fr[0, 0, 0, 1] == 0 and fr[0, -1, 0, 1] == 383


def test_get_geometry_roundtrip_pinhole():
    """Project ego points into the camera, run get_geometry on the pixel
    frustum, and check the original points are recovered."""
    rng = np.random.RandomState(0)
    b, n = 2, 1
    rot = np.stack([_rand_rot(rng)[None] for _ in range(b)])  # [B,1,3,3]
    tran = rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)
    k = np.array([[700.0, 0, 600, 44.9], [0, 700, 180, 0.1], [0, 0, 1, 0.003]])
    intrins = np.broadcast_to(k, (b, n, 3, 4)).astype(np.float32)
    post_rots = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3)).copy()
    post_rots = post_rots * 0.5  # uniform resize by 0.5
    post_rots[..., 2, 2] = 1.0
    post_trans = np.zeros((b, n, 3), np.float32)
    post_trans[..., 0] = -3.0
    bda = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3))

    frustum = geometry.create_frustum((96, 320), 8, (2.0, 10.0, 0.5))
    geom = np.asarray(
        geometry.get_geometry(
            jnp.asarray(frustum),
            jnp.asarray(rot),
            jnp.asarray(tran),
            jnp.asarray(intrins),
            jnp.asarray(post_rots),
            jnp.asarray(post_trans),
            jnp.asarray(bda),
        )
    )

    # forward-project a few recovered ego points and compare pixel coords
    for bi in range(b):
        pts = geom[bi, 0].reshape(-1, 3)[::173]
        cam = (np.linalg.inv(rot[bi, 0]) @ (pts - tran[bi, 0]).T).T
        homo = np.concatenate([cam, np.ones((len(cam), 1))], axis=1)
        pix = (k @ homo.T).T
        uv = pix[:, :2] / pix[:, 2:3]
        # apply augmentation homography
        uv_aug = uv * 0.5 + np.array([-3.0, 0.0])
        frustum_flat = frustum.reshape(-1, 3)[::173]
        np.testing.assert_allclose(uv_aug[:, 0], frustum_flat[:, 0], atol=2e-2)
        np.testing.assert_allclose(uv_aug[:, 1], frustum_flat[:, 1], atol=2e-2)
        # depth equals the frustum depth
        np.testing.assert_allclose(pix[:, 2], frustum_flat[:, 2], atol=1e-3)


def test_mlp_input_is_30d_for_kitti():
    b, n = 2, 2
    rot = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3))
    tran = np.zeros((b, n, 3), np.float32)
    intrin = np.zeros((b, n, 3, 4), np.float32)
    post_rot = np.broadcast_to(np.eye(3, dtype=np.float32), (b, n, 3, 3))
    post_tran = np.zeros((b, n, 3), np.float32)
    out = geometry.get_mlp_input(
        jnp.asarray(rot),
        jnp.asarray(tran),
        jnp.asarray(intrin),
        jnp.asarray(post_rot),
        jnp.asarray(post_tran),
    )
    assert out.shape == (b, n, 30)


def test_voxel_indices_and_ranks():
    dx, bx, nx = geometry.gen_dx_bx([0, 4, 1], [0, 4, 1], [0, 2, 1])
    geom = jnp.asarray(
        [[0.2, 0.2, 0.2], [3.9, 3.9, 1.9], [-0.6, 0.0, 0.0], [4.6, 0.0, 0.0],
         [-1.2, 0.0, 0.0]]
    )
    coords, valid = geometry.voxel_indices(geom, dx, bx, nx)
    # [-0.6, ...] is kept in bin 0: the reference quantizes with torch's
    # ``.long()`` (truncation toward zero), so fractional indices in (-1, 0)
    # alias into the first bin (full-model golden parity depends on this)
    np.testing.assert_array_equal(
        np.asarray(valid), [True, True, True, False, False]
    )
    np.testing.assert_array_equal(np.asarray(coords)[0], [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(coords)[1], [3, 3, 1])
    np.testing.assert_array_equal(np.asarray(coords)[2], [0, 0, 0])
    ranks = geometry.flatten_voxel_ranks(coords, valid, nx)
    assert int(ranks[0]) == 0
    assert int(ranks[1]) == 3 * 8 + 3 * 2 + 1
    assert int(ranks[2]) == 0
    assert int(ranks[3]) == 32 and int(ranks[4]) == 32  # sentinel


def test_disparity_positions_formula():
    calib = jnp.asarray([388.0])
    pos = np.asarray(geometry.disparity_positions(calib, 112))
    assert pos.shape == (1, 112)
    np.testing.assert_allclose(pos[0, 0], 388.0 / 4.0)
    np.testing.assert_allclose(pos[0, 111], 388.0 / 4.0 / 112.0)
