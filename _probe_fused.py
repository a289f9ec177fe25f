import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
exec(open('_probe_common.py').read())
from stereoscene_tpu.ops.pallas_splat_fused import pallas_lift_splat_fused
from stereoscene_tpu.ops.voxel_pool import lift_splat

B, D, FH, FW, C = 1, 112, 48, 160, 128
GRID = (128, 128, 16)
rng = np.random.RandomState(0)
dp = jax.nn.softmax(jnp.asarray(rng.randn(B,D,FH,FW).astype(np.float32)), axis=1)
feat = jnp.asarray(rng.randn(B,FH,FW,C).astype(np.float32))
nvox = GRID[0]*GRID[1]*GRID[2]
rk = rng.randint(0, nvox, (B, D*FH*FW)).astype(np.int32)
rk[rng.rand(*rk.shape) < 0.3] = nvox
rk = jnp.asarray(rk)
order = jax.vmap(jnp.argsort)(rk)  # static per sequence: precomputed

f_ref = jax.jit(lambda p, ft: lift_splat(p.astype(jnp.float32), ft.astype(jnp.float32), rk, GRID))
f_fused = jax.jit(lambda p, ft: pallas_lift_splat_fused(p, ft, rk, GRID, order=order))
o1 = f_ref(dp, feat); o2 = f_fused(dp, feat)
print("max diff:", float(jnp.max(jnp.abs(o1.astype(jnp.float32)-o2))), flush=True)
t = chained_time(lambda x: f_ref(x, feat), dp, iters=10); print(f"xla scatter: {t:.2f} ms", flush=True)
t = chained_time(lambda x: f_fused(x, feat), dp, iters=10); print(f"fused pallas (static order): {t:.2f} ms", flush=True)
