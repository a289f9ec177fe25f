import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
from stereoscene_tpu.models.efficientnet import CustomEfficientNet

def rand_vars(module, x):
    shapes = jax.eval_shape(lambda k: module.init(k, x, train=False), jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        if leaf.dtype == jnp.uint32: return np.zeros(leaf.shape, np.uint32)
        if "scale" in name or "var" in name: return np.ones(leaf.shape, np.float32)
        if "bias" in name or "mean" in name: return np.zeros(leaf.shape, np.float32)
        fan = int(np.prod(leaf.shape[:-1])) or 1
        return (rng.randn(*leaf.shape)/np.sqrt(fan)).astype(np.float32)
    v = jax.tree_util.tree_map_with_path(fill, shapes)
    return jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16) if a.dtype==np.float32 else jnp.asarray(a), v),
        jax.devices()[0])

def chained_time(fn, x, iters=8):
    out = fn(x); _ = float(jnp.max(jnp.abs(out[-1].astype(jnp.float32))))
    fb = 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x + jnp.asarray(fb, x.dtype))
        fb = jnp.max(jnp.abs(out[-1].astype(jnp.float32))) * 0
    _ = float(fb)
    return (time.perf_counter()-t0)/iters*1000

x = jnp.asarray(np.random.randn(2,384,1280,3).astype(np.float32), jnp.bfloat16)
for cp in (False, True):
    bb = CustomEfficientNet(arch='b7', out_indices=(2,3,4,5,6),
                            drop_path_rate=0.2, with_cp=cp)
    v = rand_vars(bb, x)
    f = jax.jit(lambda vv, xx: bb.apply(vv, xx, train=False))
    t = chained_time(lambda xx: f(v, xx), x)
    print(f"with_cp={cp}: {t:.1f} ms", flush=True)
