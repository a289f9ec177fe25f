"""Parity tests against the ACTUAL reference code, not a transcription.

Four reference modules import only torch/numpy/einops and can be executed
directly in this environment:

- ``occupancy/image2bev/attention.py``  — the MIE BRI attention + CA3D
  (the paper's core interaction block)
- ``occupancy/dense_heads/lovasz_softmax.py`` — Lovasz-softmax
- ``utils/semkitti.py``                 — the full SSC loss suite
- ``utils/gaussian.py``                 — the Gaussian (KLV) depth target

These tests load them by file path (no package import — the plugin
``__init__`` needs mmdet) and assert our JAX implementations match the
reference forward numerics on random inputs. They also cross-check the
transcribed classes in ``tests/torch_oracle.py`` against the reference by
loading the reference state dict into them, closing the
"parity-vs-my-own-transcription" loophole.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

REF_ROOT = "/root/reference/projects/mmdet3d_plugin"

pytestmark = [
    # full tier only: imports and executes the reference's own modules
    pytest.mark.slow,
    pytest.mark.skipif(
        not os.path.isdir(REF_ROOT), reason="reference tree not available"
    ),
]


def _load(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF_ROOT, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_attention():
    return _load("ref_attention", "occupancy/image2bev/attention.py")


@pytest.fixture(scope="module")
def ref_semkitti():
    return _load("ref_semkitti", "utils/semkitti.py")


@pytest.fixture(scope="module")
def ref_lovasz():
    return _load("ref_lovasz", "occupancy/dense_heads/lovasz_softmax.py")


@pytest.fixture(scope="module")
def ref_gaussian():
    return _load("ref_gaussian", "utils/gaussian.py")


# ---------------------------------------------------------------------------
# BRI attention (ref attention.py:45-86)
# ---------------------------------------------------------------------------


def _set_scalar_conv(conv, w, b):
    with torch.no_grad():
        conv.weight.fill_(w)
        conv.bias.fill_(b)


def test_bri_attention_vs_reference(ref_attention):
    from stereoscene_tpu.models.mie import BRIAttention

    torch.manual_seed(0)
    ref = ref_attention.attention(in_dim=1).eval()
    wq, bq, wk, bk, wv, bv, gamma = 0.8, 0.1, -0.6, 0.05, 1.2, -0.2, 0.7
    _set_scalar_conv(ref.query_conv, wq, bq)
    _set_scalar_conv(ref.key_conv, wk, bk)
    _set_scalar_conv(ref.value_conv, wv, bv)
    with torch.no_grad():
        ref.gamma.fill_(gamma)

    rng = np.random.RandomState(1)
    q = rng.randn(2, 1, 12, 6, 10).astype(np.float32)
    kv = rng.randn(2, 1, 12, 6, 10).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(q), torch.from_numpy(kv)).numpy()

    model = BRIAttention(chunk=16)
    params = {
        "params": {
            "query_w": jnp.array([wq]), "query_b": jnp.array([bq]),
            "key_w": jnp.array([wk]), "key_b": jnp.array([bk]),
            "value_w": jnp.array([wv]), "value_b": jnp.array([bv]),
            "gamma": jnp.array([gamma]),
        }
    }
    out = model.apply(params, jnp.asarray(q[:, 0]), jnp.asarray(kv[:, 0]))
    np.testing.assert_allclose(
        np.asarray(out), out_ref[:, 0], rtol=1e-4, atol=1e-5
    )


def test_oracle_bri_matches_reference_statedict(ref_attention):
    """TorchBRIAttention (the transcription every other parity test flows
    through) must be weight-compatible and numerically identical to the
    reference attention module."""
    from tests.torch_oracle import TorchBRIAttention

    torch.manual_seed(2)
    ref = ref_attention.attention(in_dim=1).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn_like(p))
    ours = TorchBRIAttention().eval()
    missing = ours.load_state_dict(ref.state_dict(), strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    rng = np.random.RandomState(3)
    q = torch.from_numpy(rng.randn(2, 1, 8, 5, 7).astype(np.float32))
    kv = torch.from_numpy(rng.randn(2, 1, 8, 5, 7).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(
            ours(q, kv).numpy(), ref(q, kv).numpy(), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# CA3D (ref attention.py:90-120)
# ---------------------------------------------------------------------------


def _torch_conv3d_to_flax(w):
    # torch [Co, Ci, kd, kh, kw] -> flax [kd, kh, kw, Ci, Co]
    return jnp.asarray(np.transpose(w.detach().numpy(), (2, 3, 4, 1, 0)))


def test_ca3d_vs_reference(ref_attention):
    from stereoscene_tpu.models.mie import CA3D

    torch.manual_seed(4)
    ch = 16
    ref = ref_attention.CA3D(channel=ch).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(0.3 * torch.randn_like(p))

    rng = np.random.RandomState(5)
    x = rng.randn(2, ch, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(x)).numpy()

    model = CA3D(channels=ch)
    x_j = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NDHWC
    variables = model.init(jax.random.PRNGKey(0), x_j)

    import flax

    params = flax.core.unfreeze(variables)["params"]

    def fill_conv(node, tconv):
        k = _torch_conv3d_to_flax(tconv.weight)
        assert node["kernel"].shape == k.shape, (
            node["kernel"].shape, k.shape)
        node["kernel"] = k
        node["bias"] = jnp.asarray(tconv.bias.detach().numpy())

    fill_conv(params["conv1"]["Conv_0"], ref.conv1[0])
    params["gn1"]["GroupNorm_0"]["scale"] = jnp.asarray(ref.conv1[2].weight.detach().numpy())
    params["gn1"]["GroupNorm_0"]["bias"] = jnp.asarray(ref.conv1[2].bias.detach().numpy())
    # 1x1x1 convs -> Dense [Ci, Co]
    params["fc_reduce"]["kernel"] = jnp.asarray(
        ref.conv2[0].weight.detach().numpy()[:, :, 0, 0, 0].T
    )
    params["fc_reduce"]["bias"] = jnp.asarray(
        ref.conv2[0].bias.detach().numpy()
    )
    params["fc_expand"]["kernel"] = jnp.asarray(
        ref.conv2[2].weight.detach().numpy()[:, :, 0, 0, 0].T
    )
    params["fc_expand"]["bias"] = jnp.asarray(
        ref.conv2[2].bias.detach().numpy()
    )
    fill_conv(params["conv2"]["Conv_0"], ref.conv[0])
    params["gn2"]["GroupNorm_0"]["scale"] = jnp.asarray(ref.conv[2].weight.detach().numpy())
    params["gn2"]["GroupNorm_0"]["bias"] = jnp.asarray(ref.conv[2].bias.detach().numpy())

    out = model.apply({"params": params}, x_j)
    out = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_oracle_ca3d_matches_reference_statedict(ref_attention):
    from tests.torch_oracle import TorchCA3D

    torch.manual_seed(6)
    ref = ref_attention.CA3D(channel=16).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(0.3 * torch.randn_like(p))
    ours = TorchCA3D(16).eval()
    res = ours.load_state_dict(ref.state_dict(), strict=True)
    assert not res.missing_keys and not res.unexpected_keys
    x = torch.from_numpy(
        np.random.RandomState(7).randn(1, 16, 4, 5, 6).astype(np.float32)
    )
    with torch.no_grad():
        np.testing.assert_allclose(
            ours(x).numpy(), ref(x).numpy(), rtol=1e-5, atol=1e-6
        )


# ---------------------------------------------------------------------------
# SSC loss suite (ref utils/semkitti.py)
# ---------------------------------------------------------------------------


def _rand_ssc(seed, b=2, c=8, shape=(5, 6, 4), ignore_frac=0.15):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, *shape, c).astype(np.float32)
    target = rng.randint(0, c, (b, *shape))
    target[rng.rand(*target.shape) < ignore_frac] = 255
    t_logits = np.moveaxis(logits, -1, 1)  # [B, C, ...]
    return logits, target, t_logits


def test_class_frequencies_match_reference(ref_semkitti):
    from stereoscene_tpu.losses.semkitti import (
        SEMANTIC_KITTI_CLASS_FREQUENCIES,
        KITTI_CLASS_NAMES,
    )

    np.testing.assert_array_equal(
        SEMANTIC_KITTI_CLASS_FREQUENCIES,
        ref_semkitti.semantic_kitti_class_frequencies,
    )
    assert KITTI_CLASS_NAMES == list(ref_semkitti.kitti_class_names)


def test_ce_ssc_loss_vs_reference(ref_semkitti):
    from stereoscene_tpu.losses.semkitti import (
        ce_ssc_loss, class_weights_from_frequencies,
    )

    logits, target, t_logits = _rand_ssc(10, c=20)
    w = class_weights_from_frequencies()
    ref = ref_semkitti.CE_ssc_loss(
        torch.from_numpy(t_logits), torch.from_numpy(target),
        torch.from_numpy(w),
    ).item()
    ours = float(ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target), w))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_geo_sem_scal_vs_reference(ref_semkitti):
    from stereoscene_tpu.losses.semkitti import geo_scal_loss, sem_scal_loss

    logits, target, t_logits = _rand_ssc(11)
    ref_geo = ref_semkitti.geo_scal_loss(
        torch.from_numpy(t_logits), torch.from_numpy(target)
    ).item()
    ref_sem = ref_semkitti.sem_scal_loss(
        torch.from_numpy(t_logits), torch.from_numpy(target)
    ).item()
    assert float(
        geo_scal_loss(jnp.asarray(logits), jnp.asarray(target))
    ) == pytest.approx(ref_geo, rel=1e-4)
    assert float(
        sem_scal_loss(jnp.asarray(logits), jnp.asarray(target))
    ) == pytest.approx(ref_sem, rel=1e-4)


def test_sem_scal_missing_class_vs_reference(ref_semkitti):
    """A class absent from the target exercises the reference's skip
    branches."""
    from stereoscene_tpu.losses.semkitti import sem_scal_loss

    logits, target, t_logits = _rand_ssc(12, c=8)
    target[target == 3] = 2  # class 3 now absent
    t = torch.from_numpy(target)
    ref = ref_semkitti.sem_scal_loss(torch.from_numpy(t_logits), t).item()
    ours = float(sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_ohem_ce_vs_reference(ref_semkitti):
    from stereoscene_tpu.losses.semkitti import (
        ohem_ce_ssc_loss, class_weights_from_frequencies,
    )

    logits, target, t_logits = _rand_ssc(13, c=20)
    w = class_weights_from_frequencies()
    ref = ref_semkitti.OHEM_CE_ssc_loss(
        torch.from_numpy(t_logits), torch.from_numpy(target),
        torch.from_numpy(w), top_k=0.25,
    ).item()
    ours = float(ohem_ce_ssc_loss(
        jnp.asarray(logits), jnp.asarray(target), w, top_k=0.25
    ))
    assert ours == pytest.approx(ref, rel=1e-4)


def test_kl_sep_vs_reference(ref_semkitti):
    from stereoscene_tpu.losses.semkitti import kl_sep

    rng = np.random.RandomState(14)
    p = rng.rand(40).astype(np.float32) + 0.05
    p /= p.sum()
    t = rng.rand(40).astype(np.float32)
    t[rng.rand(40) < 0.3] = 0.0
    t /= max(t.sum(), 1e-6)
    ref = ref_semkitti.KL_sep(
        torch.from_numpy(p), torch.from_numpy(t)
    ).item()
    assert float(kl_sep(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        ref, rel=1e-4, abs=1e-6
    )


def test_frustum_dist_loss_vs_reference(ref_semkitti):
    from stereoscene_tpu.losses.extras import frustum_proportion_loss

    rng = np.random.RandomState(15)
    b, c, nf = 2, 6, 4
    shape = (5, 6, 4)
    logits = rng.randn(b, *shape, c).astype(np.float32)
    t_logits = np.moveaxis(logits, -1, 1)
    masks = rng.rand(b, nf, *shape) > 0.5
    dists = (rng.rand(b, nf, c) * 20).astype(np.float32)
    dists[0, 1] = 0.0  # one empty frustum in one batch item
    ref = ref_semkitti.compute_frustum_dist_loss(
        torch.from_numpy(t_logits),
        torch.from_numpy(masks.astype(np.float32)),
        torch.from_numpy(dists),
    ).item()
    ours = float(frustum_proportion_loss(
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(dists)
    ))
    assert ours == pytest.approx(ref, rel=1e-4)


# ---------------------------------------------------------------------------
# Lovasz-softmax (ref dense_heads/lovasz_softmax.py)
# ---------------------------------------------------------------------------


def test_lovasz_softmax_vs_reference(ref_lovasz):
    from stereoscene_tpu.losses.lovasz import lovasz_softmax

    rng = np.random.RandomState(16)
    b, c, h, w = 2, 7, 9, 11
    logits = rng.randn(b, c, h, w).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=1)
    labels = rng.randint(0, c, (b, h, w))
    labels[rng.rand(b, h, w) < 0.2] = 255

    ref = ref_lovasz.lovasz_softmax(
        probs, torch.from_numpy(labels), classes="present", ignore=255
    ).item()
    probs_last = np.moveaxis(probs.numpy(), 1, -1)
    ours = float(lovasz_softmax(
        jnp.asarray(probs_last), jnp.asarray(labels), ignore=255
    ))
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)


def test_lovasz_softmax_no_ignore_vs_reference(ref_lovasz):
    from stereoscene_tpu.losses.lovasz import lovasz_softmax

    rng = np.random.RandomState(17)
    b, c, h, w = 1, 5, 6, 8
    probs = torch.softmax(torch.from_numpy(
        rng.randn(b, c, h, w).astype(np.float32)), dim=1)
    labels = rng.randint(0, c, (b, h, w))
    ref = ref_lovasz.lovasz_softmax(
        probs, torch.from_numpy(labels), classes="present"
    ).item()
    ours = float(lovasz_softmax(
        jnp.asarray(np.moveaxis(probs.numpy(), 1, -1)),
        jnp.asarray(labels), ignore=None,
    ))
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-6)


# ---------------------------------------------------------------------------
# Gaussian (KLV) depth target (ref utils/gaussian.py:90-130)
# ---------------------------------------------------------------------------


def test_gaussian_depth_target_vs_reference(ref_gaussian):
    from stereoscene_tpu.losses.extras import gaussian_depth_target

    rng = np.random.RandomState(18)
    b, n, h, w = 1, 2, 8, 12
    stride = 4
    dbound = (2.0, 58.0, 0.5)
    num_depth = int((dbound[1] - dbound[0]) / dbound[2])
    depth = (rng.rand(b, n, h, w) * 40 + 6).astype(np.float32)
    depth[rng.rand(b, n, h, w) < 0.3] = 0.0  # sparse LiDAR

    ref_dist, ref_min = ref_gaussian.generate_guassian_depth_target(
        torch.from_numpy(depth), stride, dbound, constant_std=0.5
    )
    ref_dist = ref_dist.numpy().reshape(-1, num_depth)
    ref_min = ref_min.numpy().reshape(-1)

    mass, depth_vals = gaussian_depth_target(
        jnp.asarray(depth), stride, dbound, num_depth, constant_std=0.5
    )
    mass, depth_vals = np.asarray(mass), np.asarray(depth_vals)

    # bit-for-bit semantics: min-pooled depth (0 for empty patches) and the
    # raw (unnormalized, interval-mismatched — see extras.py docstring)
    # CDF-difference bins both match the reference exactly
    np.testing.assert_allclose(depth_vals, ref_min, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(mass, ref_dist, rtol=1e-4, atol=1e-6)
