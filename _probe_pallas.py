"""Pallas splat vs XLA scatter on the real TPU at flagship shapes."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
exec(open('_probe_common.py').read())
from stereoscene_tpu.ops.pallas_splat import pallas_lift_splat
from stereoscene_tpu.ops.voxel_pool import lift_splat

B, D, FH, FW, C = 1, 112, 48, 160, 128
GRID = (128, 128, 16)
rng = np.random.RandomState(0)
dp = jax.nn.softmax(jnp.asarray(rng.randn(B,D,FH,FW).astype(np.float32)), axis=1)
feat = jnp.asarray(rng.randn(B,FH,FW,C).astype(np.float32))
nvox = GRID[0]*GRID[1]*GRID[2]
rk = rng.randint(0, nvox, (B, D*FH*FW)).astype(np.int32)
rk[rng.rand(*rk.shape) < 0.3] = nvox   # ~30% out of frustum like real data
rk = jnp.asarray(rk)

f_ref = jax.jit(lambda p, ft: lift_splat(p.astype(jnp.float32), ft.astype(jnp.float32), rk, GRID))
f_pal = jax.jit(lambda p, ft: pallas_lift_splat(p, ft, rk, GRID))

o1 = f_ref(dp, feat); o2 = f_pal(dp, feat)
err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2)))
print("max abs diff:", err, flush=True)

t = chained_time(lambda x: f_ref(x, feat), dp, iters=10)
print(f"xla scatter: {t:.2f} ms", flush=True)
t = chained_time(lambda x: f_pal(x, feat), dp, iters=10)
print(f"pallas splat: {t:.2f} ms", flush=True)

# breakdown: sort / gather / searchsorted / kernel-only
order_fn = jax.jit(lambda r: jnp.argsort(r[0]))
t = chained_time(lambda x: order_fn((rk + (x[0,0,0,0]*0).astype(rk.dtype))[None][0]), dp, iters=10)
print(f"argsort: {t:.2f} ms", flush=True)

from stereoscene_tpu.ops.pallas_splat import _splat_sorted, CHUNK, TILE
order = jnp.argsort(rk[0]); rks = rk[0][order]
pix = order % (48*160)
pad = (-(112*48*160)) % CHUNK + CHUNK
rks_p = jnp.concatenate([rks, jnp.full((pad,), 128*128*16 + TILE, jnp.int32)])
gather_fn = jax.jit(lambda p, ft: p.reshape(-1)[order, None].astype(jnp.float32) * ft.reshape(-1, 128)[pix].astype(jnp.float32))
t = chained_time(lambda x: gather_fn(x[0], feat[0]), dp, iters=10)
print(f"lift-gather: {t:.2f} ms", flush=True)

vals0 = gather_fn(dp[0], feat[0])
vals_p = jnp.concatenate([vals0, jnp.zeros((pad, 128), jnp.float32)])
kern_fn = jax.jit(lambda v: _splat_sorted(v, rks_p, 128*128*16, False))
t = chained_time(lambda x: kern_fn(x), vals_p, iters=10)
print(f"kernel-only(+searchsorted): {t:.2f} ms", flush=True)
