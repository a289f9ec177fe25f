"""Torch <-> flax layer parity: validates both the converter's tensor
transforms and our torch-semantics layer implementations by running the same
weights through torch and our modules and comparing outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from stereoscene_tpu.models.layers import (
    ConvNd,
    ConvTransposeTorch,
    GroupNorm,
)
from stereoscene_tpu.ops.deform_conv import deform_conv2d
from stereoscene_tpu.utils import checkpoint_convert as cc


def test_conv2d_parity():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    tconv = torch.nn.Conv2d(5, 7, 3, stride=2, padding=1)
    with torch.no_grad():
        ref = tconv(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    mod = ConvNd(features=7, kernel_size=3, ndim=2, stride=2, padding=1)
    params = {
        "Conv_0": {
            "kernel": cc.conv2d_kernel(tconv.weight.detach().numpy()),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_conv3d_grouped_parity():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 6, 8, 10, 8).astype(np.float32)
    tconv = torch.nn.Conv3d(8, 12, 3, padding=1, groups=4, bias=False)
    with torch.no_grad():
        ref = tconv(torch.tensor(x).permute(0, 4, 1, 2, 3)).permute(
            0, 2, 3, 4, 1
        )
    mod = ConvNd(features=12, kernel_size=3, ndim=3, padding=1, groups=4,
                 use_bias=False)
    params = {"Conv_0": {"kernel": cc.conv3d_kernel(tconv.weight.detach().numpy())}}
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_conv_transpose3d_parity():
    """The hourglass decoder pattern: k=3, s=2, p=1, op=1 (exact 2x)."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4, 6, 8, 3).astype(np.float32)
    tconv = torch.nn.ConvTranspose3d(
        3, 5, 3, stride=2, padding=1, output_padding=1, bias=False
    )
    with torch.no_grad():
        ref = tconv(torch.tensor(x).permute(0, 4, 1, 2, 3)).permute(
            0, 2, 3, 4, 1
        )
    mod = ConvTransposeTorch(features=5, kernel_size=3, ndim=3, stride=2,
                             padding=1, output_padding=1, use_bias=False)
    params = {"kernel": cc.conv_transpose3d_kernel(tconv.weight.detach().numpy())}
    out = mod.apply({"params": params}, jnp.asarray(x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_conv_transpose2d_stride4_parity():
    """SECONDFPN upsample pattern: k=s=4, p=0."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 7, 6).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(6, 4, 4, stride=4, bias=False)
    with torch.no_grad():
        ref = tconv(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    mod = ConvTransposeTorch(features=4, kernel_size=4, ndim=2, stride=4,
                             use_bias=False)
    params = {"kernel": cc.conv_transpose2d_kernel(tconv.weight.detach().numpy())}
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_groupnorm_parity():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 5, 6, 8).astype(np.float32)
    tgn = torch.nn.GroupNorm(2, 8)
    with torch.no_grad():
        tgn.weight.copy_(torch.tensor(rng.randn(8).astype(np.float32)))
        tgn.bias.copy_(torch.tensor(rng.randn(8).astype(np.float32)))
        ref = tgn(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
    mod = GroupNorm(num_groups=2)
    params = {
        "GroupNorm_0": {
            "scale": tgn.weight.detach().numpy(),
            "bias": tgn.bias.detach().numpy(),
        }
    }
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_groupnorm_on_vector_parity():
    """GN over a [B, C] camera-embedding vector (DepthNet's mlp bn)."""
    rng = np.random.RandomState(5)
    x = rng.randn(4, 30).astype(np.float32)
    tgn = torch.nn.GroupNorm(2, 30)
    with torch.no_grad():
        ref = tgn(torch.tensor(x))
    mod = GroupNorm(num_groups=2)
    params = {
        "GroupNorm_0": {
            "scale": tgn.weight.detach().numpy(),
            "bias": tgn.bias.detach().numpy(),
        }
    }
    out = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)


def test_deform_conv_zero_offsets_equals_regular_conv():
    """With zero offsets a DCN must equal a plain 3x3 conv — validates both
    the sampling math and the mmcv weight layout transform."""
    rng = np.random.RandomState(6)
    x = rng.randn(1, 8, 10, 8).astype(np.float32)
    tconv = torch.nn.Conv2d(8, 8, 3, padding=1, groups=4, bias=False)
    with torch.no_grad():
        ref = tconv(torch.tensor(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1)

    w = cc.dcn_weight(tconv.weight.detach().numpy())
    offsets = jnp.zeros((1, 8, 10, 18))
    out = deform_conv2d(jnp.asarray(x), offsets, jnp.asarray(w), groups=4)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-4)
