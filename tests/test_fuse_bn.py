import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.efficientnet import ConvBNAct
from stereoscene_tpu.utils.fuse_bn import fuse_conv_bn


def test_fuse_conv_bn_preserves_output():
    rng = np.random.RandomState(0)
    mod = ConvBNAct(features=8, kernel=3)
    x = jnp.asarray(rng.randn(2, 6, 10, 4).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    # make the BN non-trivial
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    params["bn"]["BatchNorm_0"]["scale"] = rng.rand(8).astype(np.float32) + 0.5
    params["bn"]["BatchNorm_0"]["bias"] = rng.randn(8).astype(np.float32)
    stats["bn"]["BatchNorm_0"]["mean"] = rng.randn(8).astype(np.float32)
    stats["bn"]["BatchNorm_0"]["var"] = rng.rand(8).astype(np.float32) + 0.5

    ref = mod.apply({"params": params, "batch_stats": stats}, x, train=False)
    fused_p, fused_s, n = fuse_conv_bn(params, stats, eps=1e-3)
    assert n == 1
    out = mod.apply(
        {"params": fused_p, "batch_stats": fused_s}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
