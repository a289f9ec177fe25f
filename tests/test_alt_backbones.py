import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.vit import ViT
from stereoscene_tpu.models.vovnet import VoVNet


def test_vit_pyramid_shapes():
    model = ViT(patch_size=16, embed_dim=64, depth=2, num_heads=4)
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    strides = [4, 8, 16, 32]
    for out, s in zip(outs, strides):
        assert out.shape[1:3] == (64 // s, 128 // s), (out.shape, s)
        assert bool(jnp.all(jnp.isfinite(out)))


def test_vovnet_shapes():
    model = VoVNet(
        stage_channels=(16, 16, 16, 16),
        concat_channels=(32, 32, 32, 32),
        blocks_per_stage=(1, 1, 1, 1),
    )
    x = jnp.zeros((1, 64, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]
    assert outs[0].shape[-1] == 32


def test_efficientnet_edgetpu_archs():
    """EdgeTPU 'e' family (ref: efficientnet.py:329-351 layer_settings['e'],
    :15-111 EdgeResidual): es/el stage widths must match the reference
    tables after compound scaling."""
    from stereoscene_tpu.models.efficientnet import (
        CustomEfficientNet,
        scaled_stage_settings,
    )

    stem, stages, head = scaled_stage_settings("es")
    assert stem == 32 and head == 1280
    assert [st[-1][1] for st in stages] == [24, 32, 48, 144, 192]
    # no SE anywhere in the 'e' family
    assert all(len(b) == 7 and b[2] == 0 for st in stages for b in st)
    # block_type per row (ref layer_settings['e']): 3x3 24/32/48 stages are
    # EdgeResidual; 5x5 96/144/192 stages are InvertedResidual
    kinds = {c: kind for st in stages for (_, c, _, _, _, kind, _) in st}
    assert kinds == {24: "edge", 32: "edge", 48: "edge",
                     96: "mb", 144: "mb", 192: "mb"}

    stem, stages, head = scaled_stage_settings("el")
    assert stem == 40 and head == 1536
    assert [st[-1][1] for st in stages] == [32, 40, 56, 176, 232]
    # el's depth-scaled stage-1 copy: expand 4, residual off (ref :455-462)
    assert stages[0][1][4] == 4 and stages[0][1][6] is False

    model = CustomEfficientNet(arch="es", out_indices=(2, 3, 4, 5, 6))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    assert [o.shape[-1] for o in outs] == [32, 48, 144, 192, 1280]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 2]
