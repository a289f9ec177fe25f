def rand_vars(module, x):
    import numpy as np, jax, jax.numpy as jnp
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
    import time, jax.numpy as jnp
    fb = 0.0
    for _ in range(6):  # warm-up: first executions after compile are slow
        out = fn(x + jnp.asarray(fb, x.dtype))
        res = out[-1] if isinstance(out, (tuple, list)) else out
        fb = jnp.max(jnp.abs(res.astype(jnp.float32))) * 0
    _ = float(fb)
    fb = 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x + jnp.asarray(fb, x.dtype))
        res = out[-1] if isinstance(out, (tuple, list)) else out
        fb = jnp.max(jnp.abs(res.astype(jnp.float32))) * 0
    _ = float(fb)
    return (time.perf_counter()-t0)/iters*1000
