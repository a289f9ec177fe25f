"""Decompose stage_view: DepthNet vs stereo encoder vs MIE vs lift-splat."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
import jax.numpy as jnp
exec(open('_probe_common.py').read())
from stereoscene_tpu.models.depth_net import DepthNet
from stereoscene_tpu.models.stereo_volume import GwcVolumeEncoder
from stereoscene_tpu.models.mie import VolumeInteraction
from stereoscene_tpu.ops.voxel_pool import lift_splat
from stereoscene_tpu.ops.gwc import groupwise_correlation_volume, warp_disparity_to_depth

B, FH, FW, CIN, D, CT = 1, 48, 160, 640, 112, 128
rng = np.random.RandomState(0)
dt = jnp.bfloat16
fl = jnp.asarray(rng.randn(B,FH,FW,CIN).astype(np.float32), dt)
fr = jnp.asarray(rng.randn(B,FH,FW,CIN).astype(np.float32), dt)
mlp = jnp.asarray(rng.randn(B,30).astype(np.float32), dt)
calib = jnp.full((B,), 380.0, jnp.float32)

def bench_mod(name, mod, *args, extract=lambda o: o):
    v = rand_vars_args(mod, *args)
    f = jax.jit(lambda vv, *a: mod.apply(vv, *a, train=False))
    def run(x0):
        return extract(f(v, x0, *args[1:]))
    t = chained_time(run, args[0], iters=10)
    print(f"{name}: {t:.2f} ms", flush=True)

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

# 1. DepthNet
dn = DepthNet(mid_channels=CIN, context_channels=CT, depth_channels=D, cam_channels=30)
v = rand_vars_args(dn, fl, mlp)
f = jax.jit(lambda vv, x: dn.apply(vv, x, mlp, train=False))
t = chained_time(lambda x: f(v, x), fl, iters=10)
print(f"depthnet: {t:.2f} ms", flush=True)

# 2. stereo encoder (gwc + warp + hourglasses)
se = GwcVolumeEncoder(max_disp=D)
v = rand_vars_args(se, fl, fr, mlp, mlp, calib)
f = jax.jit(lambda vv, x: se.apply(vv, x, fr, mlp, mlp, calib, train=False)["single_channel"])
t = chained_time(lambda x: f(v, x), fl, iters=10)
print(f"stereo_encoder: {t:.2f} ms", flush=True)

# 2b. just gwc + warp (64-ch match features)
mf = jnp.asarray(rng.randn(B,FH,FW,64).astype(np.float32), dt)
g = jax.jit(lambda a, b_: warp_disparity_to_depth(
    groupwise_correlation_volume(a, b_, D, 32), 
    jnp.broadcast_to(calib[:,None]/4.0/jnp.arange(1,D+1)[None,:], (B,D))).astype(dt))
t = chained_time(lambda x: g(x, mf), mf, iters=10)
print(f"gwc+warp: {t:.2f} ms", flush=True)

# 3. MIE
sp = jax.nn.softmax(jnp.asarray(rng.randn(B,D,FH,FW).astype(np.float32), dt), axis=1)
mie = VolumeInteraction(attention_chunk=1024)
v = rand_vars_args(mie, sp, sp)
f = jax.jit(lambda vv, x: mie.apply(vv, x, sp, train=False))
t = chained_time(lambda x: f(v, x), sp, iters=10)
print(f"mie: {t:.2f} ms", flush=True)

# 4. lift-splat
feat = jnp.asarray(rng.randn(B,FH,FW,CT).astype(np.float32), dt)
ranks = jnp.asarray(rng.randint(0, 128*128*16, (B, D*FH*FW)).astype(np.int32))
ls = jax.jit(lambda p, ft: lift_splat(p.astype(jnp.float32), ft.astype(jnp.float32), ranks, (128,128,16)).astype(dt))
t = chained_time(lambda x: ls(x, feat), sp, iters=10)
print(f"lift_splat(scatter): {t:.2f} ms", flush=True)

from stereoscene_tpu.ops.voxel_pool import lift_splat as ls2
ls_sorted = jax.jit(lambda p, ft: ls2(p.astype(jnp.float32), ft.astype(jnp.float32), ranks, (128,128,16), method="sorted").astype(dt))
t = chained_time(lambda x: ls_sorted(x, feat), sp, iters=10)
print(f"lift_splat(sorted): {t:.2f} ms", flush=True)
