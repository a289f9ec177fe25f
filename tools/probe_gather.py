#!/usr/bin/env python
"""Probe: does Mosaic compile a take_along_axis-shaped row gather?

Tests the candidate formulations for the fused lift-splat kernel's in-kernel
feature-table lookup (ops/pallas_splat_fused.py) on the real TPU.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW, C, CHUNK = 7680, 128, 1024


def run(name, kernel, idx_shape):
    feat = jnp.asarray(np.random.RandomState(0).randn(HW, C), jnp.float32)
    idx = jnp.asarray(
        np.random.RandomState(1).randint(0, HW, idx_shape), jnp.int32
    )
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((CHUNK, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(feat, idx)
        ref = np.asarray(feat)[np.asarray(idx).reshape(-1)[:CHUNK] if idx.ndim == 1 else np.asarray(idx)[:, 0]][:CHUNK]
        ok = np.allclose(np.asarray(out), ref)
        print(f"{name}: COMPILES, correct={ok}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAILS — {msg}")


def k_taa_full(feat_ref, idx_ref, out_ref):
    # indices [CHUNK, C] (broadcast per column), input [HW, C]
    out_ref[:] = jnp.take_along_axis(feat_ref[:], idx_ref[:], axis=0)


def k_taa_1col(feat_ref, idx_ref, out_ref):
    # indices [CHUNK, 1] broadcast inside the kernel
    idx = jnp.broadcast_to(idx_ref[:], (CHUNK, C))
    out_ref[:] = jnp.take_along_axis(feat_ref[:], idx, axis=0)


def k_take(feat_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(feat_ref[:], idx_ref[:].reshape(-1), axis=0)


if __name__ == "__main__":
    print("devices:", jax.devices())
    run("take_along_axis idx[CHUNK,C]", k_taa_full, (CHUNK, C))
    run("take_along_axis idx[CHUNK,1]->bcast", k_taa_1col, (CHUNK, 1))
    run("jnp.take idx[CHUNK]", k_take, (CHUNK,))
