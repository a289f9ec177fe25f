"""Throughput vs batch size for the staged flagship forward."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
from stereoscene_tpu.models.detector import BEVDepthOccupancy, DetectorConfig
from stereoscene_tpu.ops.resize import resize_trilinear
from bench import make_flagship_batch
exec(open('_probe_common.py').read())

cfg = DetectorConfig(backbone_with_cp=False)
model = BEVDepthOccupancy(cfg=cfg)

for B in (1, 2, 4):
    batch = make_flagship_batch(cfg, B)
    shapes = jax.eval_shape(lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0))
    r = np.random.RandomState(0)
    def fill(path, leaf):
        name = "/".join(str(p) for p in path).lower()
        if leaf.dtype == jnp.uint32: return np.zeros(leaf.shape, np.uint32)
        if "scale" in name or "var" in name: return np.ones(leaf.shape, np.float32)
        if "bias" in name or "mean" in name: return np.zeros(leaf.shape, np.float32)
        fan = int(np.prod(leaf.shape[:-1])) or 1
        return (r.randn(*leaf.shape)/np.sqrt(fan)).astype(np.float32)
    v = jax.tree_util.tree_map_with_path(fill, shapes)
    v = jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(a, jnp.bfloat16) if a.dtype==np.float32 else jnp.asarray(a), v),
        jax.devices()[0])

    @jax.jit
    def fwd(vv, b):
        out = model.apply(vv, b, train=False)
        logits = out["output_voxels"][0].astype(jnp.float32)
        return jnp.argmax(resize_trilinear(logits, (256,256,32)), axis=-1)

    imgs0 = batch["imgs"]
    def loop(n):
        fb = jnp.zeros((), imgs0.dtype)
        t0 = time.perf_counter()
        for _ in range(n):
            bb = dict(batch); bb["imgs"] = imgs0 + fb
            pred = fwd(v, bb)
            fb = (jnp.max(pred)*0).astype(imgs0.dtype)
        _ = float(fb)
        return time.perf_counter()-t0
    try:
        loop(4)  # compile+warmup
        dt = loop(10)
        print(f"B={B}: {dt/10*1000:.1f} ms/iter -> {B*10/dt:.2f} fps", flush=True)
    except Exception as e:
        print(f"B={B}: failed {type(e).__name__} {str(e)[:200]}", flush=True)
