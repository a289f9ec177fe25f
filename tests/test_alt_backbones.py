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
