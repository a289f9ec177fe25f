import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu import geometry
from stereoscene_tpu.ops import (
    confidence_attention,
    groupwise_correlation_volume,
    lift_splat,
    voxel_pool_scatter,
    voxel_pool_sorted,
    warp_disparity_to_depth,
)


def _naive_gwc(left, right, max_disp, num_groups):
    """Literal loop transcription of build_gwc_volume
    (ViewTransformerLSSVoxel.py:104-114), channels-last."""
    b, h, w, c = left.shape
    cpg = c // num_groups
    vol = np.zeros((b, max_disp, h, w, num_groups), np.float32)
    for i in range(max_disp):
        if i == 0:
            prod = left * right
            prod = prod.reshape(b, h, w, num_groups, cpg).mean(-1)
            vol[:, 0] = prod
        else:
            prod = left[:, :, i:] * right[:, :, :-i]
            prod = prod.reshape(b, h, w - i, num_groups, cpg).mean(-1)
            vol[:, i, :, i:] = prod
    return vol


def test_gwc_volume_matches_naive():
    rng = np.random.RandomState(0)
    left = rng.randn(2, 4, 12, 8).astype(np.float32)
    right = rng.randn(2, 4, 12, 8).astype(np.float32)
    ours = np.asarray(groupwise_correlation_volume(jnp.asarray(left), jnp.asarray(right), 6, 4))
    ref = _naive_gwc(left, right, 6, 4)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_warp_matches_naive_lerp():
    rng = np.random.RandomState(1)
    vol = rng.randn(2, 8, 3, 4, 2).astype(np.float32)
    calib = jnp.asarray([12.0, 20.0])
    pos = geometry.disparity_positions(calib, 10)  # some positions out of range
    out = np.asarray(warp_disparity_to_depth(jnp.asarray(vol), pos))
    assert out.shape == (2, 10, 3, 4, 2)

    pos_np = np.asarray(pos)
    for b in range(2):
        for k in range(10):
            p = pos_np[b, k]
            i0, i1 = int(np.floor(p)), int(np.floor(p)) + 1
            w1 = p - i0
            acc = np.zeros((3, 4, 2), np.float32)
            if 0 <= i0 <= 7:
                acc += (1 - w1) * vol[b, i0]
            if 0 <= i1 <= 7:
                acc += w1 * vol[b, i1]
            np.testing.assert_allclose(out[b, k], acc, rtol=1e-4, atol=1e-5)


def test_voxel_pool_scatter_equals_sorted_and_numpy():
    rng = np.random.RandomState(2)
    p, c, v = 500, 16, 64
    feats = rng.randn(p, c).astype(np.float32)
    ranks = rng.randint(0, v + 1, size=p).astype(np.int32)  # some -> sentinel

    out_a = np.asarray(voxel_pool_scatter(jnp.asarray(feats), jnp.asarray(ranks), v))
    out_b = np.asarray(voxel_pool_sorted(jnp.asarray(feats), jnp.asarray(ranks), v))

    ref = np.zeros((v, c), np.float32)
    for i in range(p):
        if ranks[i] < v:
            ref[ranks[i]] += feats[i]

    np.testing.assert_allclose(out_a, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out_b, ref, rtol=1e-4, atol=1e-5)


def test_voxel_pool_gradients_match():
    rng = np.random.RandomState(3)
    p, c, v = 64, 4, 16
    feats = jnp.asarray(rng.randn(p, c).astype(np.float32))
    ranks = jnp.asarray(rng.randint(0, v + 1, size=p).astype(np.int32))

    g_a = jax.grad(lambda f: jnp.sum(voxel_pool_scatter(f, ranks, v) ** 2))(feats)
    g_b = jax.grad(lambda f: jnp.sum(voxel_pool_sorted(f, ranks, v) ** 2))(feats)
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), rtol=1e-4, atol=1e-5)


def test_lift_splat_shapes_and_mass():
    rng = np.random.RandomState(4)
    b, d, fh, fw, c = 2, 6, 4, 8, 5
    grid = (4, 4, 2)
    depth_prob = jax.nn.softmax(jnp.asarray(rng.randn(b, d, fh, fw)), axis=1)
    feat = jnp.asarray(rng.randn(b, fh, fw, c).astype(np.float32))
    nvox = grid[0] * grid[1] * grid[2]
    ranks = jnp.asarray(rng.randint(0, nvox, size=(b, d * fh * fw)).astype(np.int32))

    out = lift_splat(depth_prob, feat, ranks, grid)
    assert out.shape == (b, *grid, c)
    # all ranks in bounds -> total mass preserved
    lifted_sum = np.asarray(
        jnp.sum(depth_prob[..., None] * feat[:, None], axis=(1, 2, 3))
    )
    np.testing.assert_allclose(
        np.asarray(jnp.sum(out, axis=(1, 2, 3))), lifted_sum, rtol=1e-4
    )


def test_confidence_attention_matches_dense():
    rng = np.random.RandomState(5)
    b, d, length = 2, 7, 50
    q = jnp.asarray(rng.randn(b, d, length).astype(np.float32))
    k = jnp.asarray(rng.randn(b, d, length).astype(np.float32))
    v = jnp.asarray(rng.randn(b, d, length).astype(np.float32))

    out = np.asarray(confidence_attention(q, k, v, chunk=16))

    # dense reference
    energy = np.einsum("bdi,bdj->bij", np.asarray(q), np.asarray(k))
    attn = np.exp(energy - energy.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    ref = np.einsum("bdj,bij->bdi", np.asarray(v), attn)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_resize_trilinear_2x_fast_path_exact():
    """The static 2x stencil must match jax.image.resize exactly (the final
    voxel upsample, ref bevdepth_occupancy.py:293-294)."""
    import jax

    from stereoscene_tpu.ops.resize import resize_trilinear

    rng = np.random.RandomState(0)
    for shape, out in [
        ((1, 8, 8, 4, 5), (16, 16, 8)),   # all-axes 2x -> pure fast path
        ((2, 5, 6, 3, 2), (10, 12, 6)),   # odd sizes, all 2x
        ((1, 4, 6, 3, 2), (8, 9, 3)),     # mixed: 2x, non-2x, identity
        ((1, 4, 4, 4, 2), (7, 9, 5)),     # no 2x axis -> general path
    ]:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        got = np.asarray(resize_trilinear(x, out))
        ref_shape = shape[:-4] + out + shape[-1:]
        ref = np.asarray(
            jax.image.resize(x, ref_shape, method="linear")
        )
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
