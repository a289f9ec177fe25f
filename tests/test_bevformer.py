import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.bevformer import (
    BEVOccHead,
    DeformableAttention,
    OccupancyEncoder,
)


def test_deformable_attention_shapes():
    rng = np.random.RandomState(0)
    mod = DeformableAttention(embed_dim=16, num_heads=2, num_points=2,
                              num_levels=1)
    q = jnp.asarray(rng.randn(1, 10, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 12 * 20, 16).astype(np.float32))
    ref = jnp.asarray(rng.rand(1, 10, 1, 2).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), q, v, [(12, 20)], ref)
    out = mod.apply(variables, q, v, [(12, 20)], ref)
    assert out.shape == (1, 10, 16)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_occupancy_encoder_and_head():
    rng = np.random.RandomState(1)
    b, n_cam, c = 1, 2, 16
    shapes = [(6, 20)]
    total = sum(h * w for h, w in shapes)
    img_feats = jnp.asarray(rng.randn(b, n_cam, total, c).astype(np.float32))

    # KITTI-like P @ Tr projection for both cameras
    k = np.array(
        [[200.0, 0, 320, 0], [0, 200, 96, 0], [0, 0, 1, 0]], np.float32
    )
    tr = np.array(
        [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]],
        np.float32,
    )
    l2i = (k @ tr)[None, None].repeat(n_cam, 1)
    l2i = jnp.asarray(np.repeat(l2i, b, 0))

    enc = OccupancyEncoder(embed_dim=c, num_layers=1, bev_shape=(8, 8),
                           num_z=2)
    variables = enc.init(
        jax.random.PRNGKey(0), img_feats, shapes, l2i, (192, 640)
    )
    bev = enc.apply(variables, img_feats, shapes, l2i, (192, 640))
    assert bev.shape == (b, 64, c)
    assert bool(jnp.all(jnp.isfinite(bev)))

    head = BEVOccHead(embed_dim=c, bev_shape=(8, 8), num_z=4, out_channel=20)
    hv = head.init(jax.random.PRNGKey(1), bev)
    logits = head.apply(hv, bev)
    assert logits.shape == (b, 8, 8, 4, 20)
