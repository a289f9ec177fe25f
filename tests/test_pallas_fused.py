import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.ops.pallas_splat_fused import pallas_lift_splat_fused
from stereoscene_tpu.ops.voxel_pool import lift_splat


def test_fused_splat_interpret_parity():
    rng = np.random.RandomState(0)
    b, d, fh, fw, c = 1, 6, 8, 16, 128
    grid = (16, 16, 4)
    nvox = 1024
    dp = jax.nn.softmax(
        jnp.asarray(rng.randn(b, d, fh, fw).astype(np.float32)), axis=1
    )
    feat = jnp.asarray(rng.randn(b, fh, fw, c).astype(np.float32))
    rk = rng.randint(0, nvox, (b, d * fh * fw)).astype(np.int32)
    rk[rng.rand(*rk.shape) < 0.1] = nvox
    rk = jnp.asarray(rk)
    ref = lift_splat(dp, feat, rk, grid)
    out = pallas_lift_splat_fused(dp, feat, rk, grid, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
