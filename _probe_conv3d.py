import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
exec(open('_probe_common.py').read())

B, D, H, W, C = 1, 112, 48, 160, 32
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B,D,H,W,C).astype(np.float32), jnp.bfloat16)
k3 = jnp.asarray(rng.randn(3,3,3,C,C).astype(np.float32)/np.sqrt(27*C), jnp.bfloat16)

f3d = jax.jit(lambda a: jax.lax.conv_general_dilated(
    a, k3, (1,1,1), [(1,1)]*3, dimension_numbers=("NDHWC","DHWIO","NDHWC")))
t = chained_time(lambda a: f3d(a), x, iters=10)
print(f"conv3d 3x3x3 c32: {t:.2f} ms ({47.6/t*1000:.0f} GFLOP/s x1e0)", flush=True)

# depth-decomposed: 3 x 2D convs over shifted D slices (D folded into batch)
k2 = [k3[i] for i in range(3)]  # each [3,3,C,C]
def f_decomp(a):
    ab = a.reshape(B*D, H, W, C)
    outs = jax.lax.conv_general_dilated(ab, k2[1], (1,1), [(1,1)]*2,
        dimension_numbers=("NHWC","HWIO","NHWC"))
    up = jax.lax.conv_general_dilated(ab, k2[0], (1,1), [(1,1)]*2,
        dimension_numbers=("NHWC","HWIO","NHWC")).reshape(B,D,H,W,C)
    dn = jax.lax.conv_general_dilated(ab, k2[2], (1,1), [(1,1)]*2,
        dimension_numbers=("NHWC","HWIO","NHWC")).reshape(B,D,H,W,C)
    outs = outs.reshape(B,D,H,W,C)
    outs = outs.at[:, 1:].add(up[:, :-1])   # contribution of d-1 plane
    outs = outs.at[:, :-1].add(dn[:, 1:])
    return outs
f2d = jax.jit(f_decomp)
# parity
d1 = f3d(x); d2 = f2d(x)
print("decomp max diff:", float(jnp.max(jnp.abs(d1.astype(jnp.float32)-d2.astype(jnp.float32)))), flush=True)
t = chained_time(lambda a: f2d(a), x, iters=10)
print(f"conv3d as 3x conv2d: {t:.2f} ms", flush=True)

# big-channel 2D conv baseline for reference: [B*D, H, W, 32]→32 k3
fb = jax.jit(lambda a: jax.lax.conv_general_dilated(
    a.reshape(B*D,H,W,C), k2[1], (1,1), [(1,1)]*2,
    dimension_numbers=("NHWC","HWIO","NHWC")))
t = chained_time(lambda a: fb(a), x, iters=10)
print(f"single conv2d k3x3: {t:.2f} ms", flush=True)
