import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
exec(open('_probe_common.py').read())
from stereoscene_tpu.models.mie import VolumeInteraction

B, D, FH, FW = 1, 112, 48, 160
rng = np.random.RandomState(0)
sp = jax.nn.softmax(jnp.asarray(rng.randn(B,D,FH,FW).astype(np.float32), jnp.bfloat16), axis=1)

def rand_vars_args(module, *args):
    shapes = jax.eval_shape(lambda k: module.init(k, *args, train=False), jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        if leaf.dtype == jnp.uint32: return np.zeros(leaf.shape, np.uint32)
        if "scale" in name or "var" in name: return np.ones(leaf.shape, np.float32)
        if "bias" in name or "mean" in name: return np.zeros(leaf.shape, np.float32)
        fan = int(np.prod(leaf.shape[:-1])) or 1
        return (r.randn(*leaf.shape)/np.sqrt(fan)).astype(np.float32)
    v = jax.tree_util.tree_map_with_path(fill, shapes)
    return jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16) if a.dtype==np.float32 else jnp.asarray(a), v),
        jax.devices()[0])

for chunk in (512, 1024, 2560, 7680):
    mie = VolumeInteraction(attention_chunk=chunk)
    v = rand_vars_args(mie, sp, sp)
    f = jax.jit(lambda vv, x: mie.apply(vv, x, sp, train=False))
    t = chained_time(lambda x: f(v, x), sp, iters=10)
    print(f"mie chunk={chunk}: {t:.2f} ms", flush=True)
