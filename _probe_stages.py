"""Per-stage timing of the b7 backbone components to find the slow layer."""
import os, time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
from flax import linen as nn
from stereoscene_tpu.models.efficientnet import ConvBNAct, InvertedResidual, scaled_stage_settings

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
    out = fn(x); _ = float(jnp.max(jnp.abs(out.astype(jnp.float32))))
    fb = 0.0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x + jnp.asarray(fb, x.dtype))
        fb = jnp.max(jnp.abs(out.astype(jnp.float32))) * 0
    _ = float(fb)
    return (time.perf_counter()-t0)/iters*1000

class Stage(nn.Module):
    blocks: tuple
    @nn.compact
    def __call__(self, x, train=False):
        for i,(k,c,se,s,e) in enumerate(self.blocks):
            x = InvertedResidual(out_channels=c, kernel=k, stride=s,
                                 expand_ratio=e, se_ratio=se, name=f"b{i}")(x, train)
        return x

stem_ch, stages, head_ch = scaled_stage_settings('b7')
B = 2
x = jnp.asarray(np.random.randn(B,384,1280,3).astype(np.float32), jnp.bfloat16)
stem = ConvBNAct(stem_ch, 3, stride=2)
sv = rand_vars(stem, x)
f = jax.jit(lambda xx: stem.apply(sv, xx, train=False))
t = chained_time(f, x); print(f"stem: {t:.1f} ms", flush=True)
x = f(x)
for si, blocks in enumerate(stages, 1):
    mod = Stage(tuple(blocks))
    v = rand_vars(mod, x)
    f = jax.jit(lambda xx, mod=mod, v=v: mod.apply(v, xx, train=False))
    t = chained_time(f, x)
    x2 = f(x)
    print(f"stage{si}: {t:.1f} ms  {tuple(x.shape)} -> {tuple(x2.shape)}", flush=True)
    x = x2
head = ConvBNAct(head_ch, 1)
hv = rand_vars(head, x)
f = jax.jit(lambda xx: head.apply(hv, xx, train=False))
print(f"head: {chained_time(f, x):.1f} ms", flush=True)
