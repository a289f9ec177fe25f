"""Golden parity: our Hourglass3D vs an independent torch transcription of
the reference hourglass spec (ViewTransformerLSSVoxel.py:70-96), weights
transferred through the checkpoint converter's layout rules."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from stereoscene_tpu.models.stereo_volume import Hourglass3D
from stereoscene_tpu.utils import checkpoint_convert as cc


class TorchHourglass(nn.Module):
    """Spec transcription: stride-2 conv+GN(2) x2 levels, deconv decoders
    with BN3d, 1x1 redirect skips."""

    def __init__(self, c):
        super().__init__()

        def convgn(cin, cout, k, s, p):
            return nn.Sequential(
                nn.Conv3d(cin, cout, k, stride=s, padding=p, bias=False),
                nn.GroupNorm(2, cout),
            )

        self.conv1 = nn.Sequential(convgn(c, 2 * c, 3, 2, 1), nn.ReLU())
        self.conv2 = nn.Sequential(convgn(2 * c, 2 * c, 3, 1, 1), nn.ReLU())
        self.conv3 = nn.Sequential(convgn(2 * c, 4 * c, 3, 2, 1), nn.ReLU())
        self.conv4 = nn.Sequential(convgn(4 * c, 4 * c, 3, 1, 1), nn.ReLU())
        self.conv5 = nn.Sequential(
            nn.ConvTranspose3d(4 * c, 2 * c, 3, padding=1, output_padding=1,
                               stride=2, bias=False),
            nn.BatchNorm3d(2 * c),
        )
        self.conv6 = nn.Sequential(
            nn.ConvTranspose3d(2 * c, c, 3, padding=1, output_padding=1,
                               stride=2, bias=False),
            nn.BatchNorm3d(c),
        )
        self.redir1 = convgn(c, c, 1, 1, 0)
        self.redir2 = convgn(2 * c, 2 * c, 1, 1, 0)

    def forward(self, x):
        c1 = self.conv1(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c5 = torch.relu(self.conv5(c4) + self.redir2(c2))
        return torch.relu(self.conv6(c5) + self.redir1(x))


def _convgn_params(seq):
    conv, gn = seq[0], seq[1]
    return {
        "conv": {"Conv_0": {
            "kernel": cc.conv3d_kernel(conv.weight.detach().numpy())
        }},
        "gn": {"GroupNorm_0": {
            "scale": gn.weight.detach().numpy(),
            "bias": gn.bias.detach().numpy(),
        }},
    }


def test_hourglass_matches_torch():
    torch.manual_seed(0)
    c = 4
    tmod = TorchHourglass(c).eval()
    # randomize norm affines so parity is non-trivial
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, (nn.GroupNorm, nn.BatchNorm3d)):
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    params = {
        "conv1": _convgn_params(tmod.conv1[0]),
        "conv2": _convgn_params(tmod.conv2[0]),
        "conv3": _convgn_params(tmod.conv3[0]),
        "conv4": _convgn_params(tmod.conv4[0]),
        "redir1": _convgn_params(tmod.redir1),
        "redir2": _convgn_params(tmod.redir2),
        "conv5_deconv": {
            "kernel": cc.conv_transpose3d_kernel(
                tmod.conv5[0].weight.detach().numpy()
            )
        },
        "conv6_deconv": {
            "kernel": cc.conv_transpose3d_kernel(
                tmod.conv6[0].weight.detach().numpy()
            )
        },
        "conv5_bn": {"BatchNorm_0": {
            "scale": tmod.conv5[1].weight.detach().numpy(),
            "bias": tmod.conv5[1].bias.detach().numpy(),
        }},
        "conv6_bn": {"BatchNorm_0": {
            "scale": tmod.conv6[1].weight.detach().numpy(),
            "bias": tmod.conv6[1].bias.detach().numpy(),
        }},
    }
    stats = {
        "conv5_bn": {"BatchNorm_0": {
            "mean": tmod.conv5[1].running_mean.numpy(),
            "var": tmod.conv5[1].running_var.numpy(),
        }},
        "conv6_bn": {"BatchNorm_0": {
            "mean": tmod.conv6[1].running_mean.numpy(),
            "var": tmod.conv6[1].running_var.numpy(),
        }},
    }

    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 8, 16, c).astype(np.float32)  # [B, D, H, W, C]
    with torch.no_grad():
        ref = tmod(torch.tensor(x).permute(0, 4, 1, 2, 3)).permute(
            0, 2, 3, 4, 1
        )

    mod = Hourglass3D(c)
    out = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy(), rtol=1e-3, atol=1e-4
    )
