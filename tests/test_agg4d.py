"""Slice-packed rank-4 aggregation domain (agg4d) is exact vs the 5D graph.

The whole stereo cost-aggregation chain (dres stem + three hourglasses +
classif heads) runs on a rank-4 [D, H, W, C] tensor for B=1 inference
(models/stereo_volume.py agg4d gate; lowerings in models/layers.py
_slice4d_*). Same parameters, same tap algebra as the 5D zpack/dpack/dphase
lowerings — these tests pin exactness so the fast path can never drift.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereoscene_tpu.models.layers import (
    _slice4d_conv_s1_dpack,
    _slice4d_conv_s1_zpack,
    _slice4d_conv_s2_dpack,
    _slice4d_deconv_k3s2,
    _slice4d_deconv_k3s2_subpixel,
    _plain_conv3d,
)
from stereoscene_tpu.models.stereo_volume import GwcVolumeEncoder, Hourglass3D


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def test_slice4d_conv_cores_exact():
    rng = np.random.RandomState(0)
    d, h, w, ci, co = 8, 4, 8, 6, 10
    x = _rand(rng, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.2
    ref = _plain_conv3d(x[None], k, 1)[0]
    for fn in (_slice4d_conv_s1_zpack, _slice4d_conv_s1_dpack):
        np.testing.assert_allclose(
            np.asarray(fn(x, k)), np.asarray(ref), rtol=2e-5, atol=2e-5
        )
    ref2 = _plain_conv3d(x[None], k, 2)[0]
    np.testing.assert_allclose(
        np.asarray(_slice4d_conv_s2_dpack(x, k)), np.asarray(ref2),
        rtol=2e-5, atol=2e-5,
    )


def test_slice4d_deconv_exact():
    rng = np.random.RandomState(1)
    d, h, w, ci, co = 4, 3, 5, 6, 7
    x = _rand(rng, d, h, w, ci)
    k = _rand(rng, 3, 3, 3, ci, co) * 0.2
    # reference: the dilated-conv lowering (torch ConvTranspose semantics)
    flipped = jnp.flip(k, axis=(0, 1, 2))
    ref = jax.lax.conv_general_dilated(
        x[None], flipped, window_strides=(1, 1, 1),
        padding=[(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]
    got = _slice4d_deconv_k3s2(x, k, jnp.float32)
    assert got.shape == ref.shape == (2 * d, 2 * h, 2 * w, co)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    got_sub = _slice4d_deconv_k3s2_subpixel(x, k, jnp.float32)
    assert got_sub.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got_sub), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_slice4d_deconv_keqs_exact():
    """k=s deconv (the FPN3D deblocks) phase-matmul lowering vs the
    lhs-dilated reference, s in {1, 2, 4}."""
    from stereoscene_tpu.models.layers import _slice4d_deconv_keqs

    rng = np.random.RandomState(7)
    d, h, w, ci, co = 4, 3, 5, 6, 7
    x = _rand(rng, d, h, w, ci)
    for s in (1, 2, 4):
        k = _rand(rng, s, s, s, ci, co) * 0.2
        flipped = jnp.flip(k, axis=(0, 1, 2))
        ref = jax.lax.conv_general_dilated(
            x[None], flipped, window_strides=(1, 1, 1),
            padding=[(s - 1, s - 1)] * 3, lhs_dilation=(s, s, s),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]
        got = _slice4d_deconv_keqs(x, k, s, jnp.float32)
        assert got.shape == ref.shape == (s * d, s * h, s * w, co), s
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
            err_msg=f"s={s}",
        )


def test_bev_stage_rank4_matches_rank5():
    """ResNet3D + FPN3D (the detector's bev_encode chain) on the
    slice-packed rank-4 grid vs the 5D graph: exact, same param tree."""
    from stereoscene_tpu.models.resnet3d import CustomResNet3D
    from stereoscene_tpu.models.second_fpn import SECONDFPN3D

    rng = np.random.RandomState(8)
    bb = CustomResNet3D(
        depth=18, num_stage=3, block_inplanes=(8, 16, 32),
        block_strides=(1, 2, 2), norm_groups=4,
    )
    neck = SECONDFPN3D(
        in_channels=(8, 16, 32), out_channels=(8, 8, 8),
        upsample_strides=(1, 2, 4), norm_groups=4,
    )
    x5 = _rand(rng, 1, 8, 8, 4, 6)
    vb = bb.init(jax.random.PRNGKey(0), x5)
    outs5 = bb.apply(vb, x5)
    outs4 = bb.apply(vb, x5[0])
    assert all(o.ndim == 4 for o in outs4)
    for o5, o4 in zip(outs5, outs4):
        np.testing.assert_allclose(
            np.asarray(o4), np.asarray(o5[0]), rtol=1e-4, atol=1e-5
        )
    vn = neck.init(jax.random.PRNGKey(1), outs5)
    f5 = neck.apply(vn, outs5)
    f4 = neck.apply(vn, outs4)
    assert f4.shape == f5.shape[1:]
    np.testing.assert_allclose(
        np.asarray(f4), np.asarray(f5[0]), rtol=1e-4, atol=1e-5
    )
    # identical param trees from either rank
    vb4 = jax.tree.map(lambda a: a.shape, bb.init(jax.random.PRNGKey(0), x5[0]))
    vb5 = jax.tree.map(lambda a: a.shape, vb)
    assert vb4 == vb5
    vn4 = jax.tree.map(lambda a: a.shape, neck.init(jax.random.PRNGKey(1), outs4))
    vn5 = jax.tree.map(lambda a: a.shape, vn)
    assert vn4 == vn5


def test_hourglass_rank4_matches_rank5():
    rng = np.random.RandomState(2)
    hg = Hourglass3D(8)
    x5 = _rand(rng, 1, 8, 4, 8, 8)
    variables = hg.init(jax.random.PRNGKey(0), x5)
    ref = hg.apply(variables, x5)
    got = hg.apply(variables, x5[0])
    assert got.ndim == 4
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[0]), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("pack", ["z", "d"])
def test_gwc_encoder_agg4d_matches_5d(monkeypatch, pack):
    rng = np.random.RandomState(3)
    enc = GwcVolumeEncoder(
        max_disp=16, out_channels=8, num_groups=8, feat_mid_channels=16,
        match_channels=8, cam_channels=6,
    )
    b, h, w, cin = 1, 8, 16, 24
    args = (
        _rand(rng, b, h, w, cin), _rand(rng, b, h, w, cin),
        _rand(rng, b, 6), _rand(rng, b, 6),
        jnp.full((b,), 30.0),
    )
    monkeypatch.setenv("STEREOSCENE_AGG4D", "0")
    variables = enc.init(jax.random.PRNGKey(0), *args)
    ref = enc.apply(variables, *args)
    monkeypatch.setenv("STEREOSCENE_AGG4D", "1")
    monkeypatch.setenv("STEREOSCENE_AGG4D_PACK", pack)
    got = enc.apply(variables, *args)
    for key in ("multi_channel", "single_channel"):
        assert got[key].shape == ref[key].shape, key
        np.testing.assert_allclose(
            np.asarray(got[key]), np.asarray(ref[key]),
            rtol=1e-4, atol=1e-5, err_msg=key,
        )


def test_mie_agg4d_matches_5d(monkeypatch):
    """The MIE DVE chain (redir1 -> hourglass -> CA3D -> redir2) is exact
    on the slice-packed rank-4 domain, including CA3D's packed GroupNorm
    and (D, H, W) squeeze pooling (models/mie.py)."""
    from stereoscene_tpu.models.mie import VolumeInteraction

    rng = np.random.RandomState(5)
    vi = VolumeInteraction(channels=8, attention_chunk=64)
    stereo = _rand(rng, 1, 8, 4, 8)
    lss = _rand(rng, 1, 8, 4, 8)
    monkeypatch.setenv("STEREOSCENE_AGG4D", "0")
    variables = vi.init(jax.random.PRNGKey(0), stereo, lss)
    # zero-init gamma/alpha gates make the block near-identity; perturb the
    # params so the test exercises the full chain with non-trivial values
    variables = jax.tree.map(
        lambda a: a + 0.05 * np.random.RandomState(6).randn(*a.shape).astype(
            np.float32
        ) if a.dtype == jnp.float32 else a,
        variables,
    )
    ref = vi.apply(variables, stereo, lss)
    monkeypatch.setenv("STEREOSCENE_AGG4D", "1")
    got = vi.apply(variables, stereo, lss)
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
    # param tree identical under either path
    monkeypatch.setenv("STEREOSCENE_AGG4D", "0")
    s5 = jax.tree.map(lambda a: a.shape, vi.init(jax.random.PRNGKey(0), stereo, lss))
    monkeypatch.setenv("STEREOSCENE_AGG4D", "1")
    s4 = jax.tree.map(lambda a: a.shape, vi.init(jax.random.PRNGKey(0), stereo, lss))
    assert s5 == s4


def test_agg4d_param_tree_identical(monkeypatch):
    """Init under either path produces the same parameter tree (checkpoint
    and converter compatibility)."""
    rng = np.random.RandomState(4)
    enc = GwcVolumeEncoder(
        max_disp=8, out_channels=8, num_groups=8, feat_mid_channels=16,
        match_channels=8, cam_channels=6,
    )
    args = (
        _rand(rng, 1, 4, 8, 24), _rand(rng, 1, 4, 8, 24),
        _rand(rng, 1, 6), _rand(rng, 1, 6), jnp.full((1,), 30.0),
    )
    monkeypatch.setenv("STEREOSCENE_AGG4D", "0")
    v5 = jax.tree.map(lambda a: a.shape, enc.init(jax.random.PRNGKey(0), *args))
    monkeypatch.setenv("STEREOSCENE_AGG4D", "1")
    v4 = jax.tree.map(lambda a: a.shape, enc.init(jax.random.PRNGKey(0), *args))
    assert jax.tree_util.tree_structure(v5) == jax.tree_util.tree_structure(v4)
    assert v5 == v4
