#!/usr/bin/env python
"""On-chip probe: DCN bilinear gather as a Pallas permutation-gather kernel.

The XLA deform_conv2d (ops/deform_conv.py) spends ~2.3-4.4 ms in 36
take_along_axis row-gathers at [7680, 640] (gathers measured byte-bound at
~80 GB/s effective — 10x off HBM speed-of-light). Mosaic's only gather
primitive is tpu.dynamic_gather with indices shaped EXACTLY like the table
(a full row permutation, verified by tools/probe_gather.py + the lowering
rule's assert). DCN fits: output positions == input positions == N, so each
tap-corner sample is a row permutation of the input.

Formulation (exact algebra): gather commutes with the channel contraction
(a row permutation of x then matmul == matmul then the same row
permutation), so precompute z_t = grouped_matmul(x, W_t) for the 9 taps in
XLA (14 GFLOP, MXU-bound), then one Pallas kernel computes
out = sum_{t,c} wgt[t,c] * z_t[idx[t,c], :] with the 36 gathers running
from VMEM-resident tiles.

Usage: python tools/probe_pallas_dcn.py [--iters 15]
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from probe_view import timeit, dispatch_overhead  # noqa: E402

B, H, W, C = 1, 48, 160, 640
K, G = 9, 4
N = B * H * W
CPG = C // G  # input channels per group


def make_inputs(rng, dt):
    x = jnp.asarray(rng.randn(B, H, W, C), dt)
    offsets = jnp.asarray(rng.randn(B, H, W, 2 * K) * 1.5, jnp.float32)
    weights = jnp.asarray(rng.randn(K, CPG, C) * 0.02, dt)
    return x, offsets, weights


def corner_tables(offsets):
    """offsets [B, H, W, 2K] -> idx [B*N?, ...]: flat corner indices
    [N, K*4] int32 (clipped in-bounds, B folded: + b*H*W) and corner
    weights [N, K*4] f32 (OOB contributions zeroed)."""
    b = offsets.shape[0]
    base_y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    base_x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    off = offsets.astype(jnp.float32).reshape(b, H, W, K, 2)
    ky = (jnp.arange(K) // 3 - 1).astype(jnp.float32)
    kx = (jnp.arange(K) % 3 - 1).astype(jnp.float32)
    sy = base_y[..., None] + ky + off[..., 0]  # [B, H, W, K]
    sx = base_x[..., None] + kx + off[..., 1]
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    fy = sy - y0
    fx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    idxs, wgts = [], []
    boff = (jnp.arange(b, dtype=jnp.int32) * (H * W))[:, None, None, None]
    for dy_, dx_, wv in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        yi = y0i + dy_
        xi = x0i + dx_
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        flat = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1) + boff
        idxs.append(flat)
        wgts.append(wv * inside.astype(jnp.float32))
    # [B, H, W, K, 4] -> [N, K*4] tap-major then corner
    idx = jnp.stack(idxs, axis=-1).reshape(b * H * W, K * 4)
    wgt = jnp.stack(wgts, axis=-1).reshape(b * H * W, K * 4)
    return idx, wgt


def _dcn_kernel(idx_ref, wgt_ref, z_ref, out_ref, *, n, lanes):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    z = z_ref[0]  # [N, lanes]
    acc = jnp.zeros((n, lanes), jnp.float32)
    for c in range(4):
        col = idx_ref[0, :, c:c + 1]  # [N, 1] int32
        idxb = jnp.broadcast_to(col, (n, lanes))
        g = jnp.take_along_axis(z, idxb, axis=0)
        wcol = wgt_ref[0, :, c:c + 1].astype(jnp.float32)
        acc = acc + g.astype(jnp.float32) * wcol
    out_ref[0] = out_ref[0] + acc.astype(out_ref.dtype)


def pallas_dcn(x, offsets, weights, lanes=128):
    dt = x.dtype
    b = x.shape[0]
    n = b * H * W
    x_flat = x.reshape(n, C)
    idx, wgt = corner_tables(offsets)
    # [N, 36] -> [K, N, 4]
    idx_t = idx.reshape(n, K, 4).transpose(1, 0, 2)
    wgt_t = wgt.reshape(n, K, 4).transpose(1, 0, 2).astype(dt)
    # z_t = grouped matmul: [9, N, C]
    w_g = weights.reshape(K, CPG, G, C // G)
    z = jnp.einsum(
        "ngi,tigo->tngo",
        x_flat.reshape(n, G, CPG), w_g,
        preferred_element_type=dt,
    ).reshape(K, n, C)
    nch = C // lanes
    out = pl.pallas_call(
        functools.partial(_dcn_kernel, n=n, lanes=lanes),
        grid=(nch, K),
        in_specs=[
            pl.BlockSpec((1, n, 4), lambda c, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 4), lambda c, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, lanes), lambda c, t: (t, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, lanes), lambda c, t: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nch, n, lanes), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(idx_t, wgt_t, z)
    # [nch, N, lanes] -> [N, C]
    out = out.transpose(1, 0, 2).reshape(n, C)
    return out.reshape(b, H, W, C).astype(dt)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=15)
    args = p.parse_args()
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    from stereoscene_tpu.ops.deform_conv import deform_conv2d

    x, offsets, weights = make_inputs(rng, dt)

    print(f"# dispatch overhead: {dispatch_overhead():.2f} ms", flush=True)

    # correctness vs the XLA path (f32 to isolate formulation error)
    xf, of, wf = make_inputs(rng, jnp.float32)
    ref = deform_conv2d(xf, of, wf, None, groups=G)
    got = pallas_dcn(xf, of, wf)
    err = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    print(f"max rel err vs XLA deform_conv2d (f32): {err:.2e}", flush=True)

    t = timeit(lambda a: deform_conv2d(a, offsets, weights, None, groups=G),
               x, iters=args.iters)
    print(f"XLA deform_conv2d: {t:.2f} ms", flush=True)

    t = timeit(lambda a: pallas_dcn(a, offsets, weights), x,
               iters=args.iters)
    print(f"pallas z-gather DCN: {t:.2f} ms", flush=True)

    # gather-only cost (z precomputed) to separate matmul from gather time
    idx_t, wgt_t = None, None


if __name__ == "__main__":
    main()
