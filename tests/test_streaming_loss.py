"""Parity of the streaming (scan-over-slabs) voxel losses vs the
monolithic upsample-then-loss path (losses/streaming.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stereoscene_tpu.engine.train import LossConfig, compute_losses
from stereoscene_tpu.losses.semkitti import (
    ce_ssc_loss,
    class_weights_from_frequencies,
    geo_scal_loss,
    sem_scal_loss,
)
from stereoscene_tpu.losses.streaming import streaming_voxel_losses
from stereoscene_tpu.ops.resize import resize_trilinear


def _case(b=1, x=8, y=16, z=4, c=20, upsample=True, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, x, y, z, c).astype(np.float32))
    gs = 2 if upsample else 1
    gt = rng.randint(0, c, (b, gs * x, gs * y, gs * z))
    gt[rng.rand(*gt.shape) < 0.1] = 255  # ignore voxels
    return logits, jnp.asarray(gt)


def _monolithic(logits, gt, cw):
    up = logits.astype(jnp.float32)
    if up.shape[1:4] != gt.shape[1:4]:
        up = resize_trilinear(up, gt.shape[1:4])
    return {
        "ce": ce_ssc_loss(up, gt, cw),
        "sem_scal": sem_scal_loss(up, gt),
        "geo_scal": geo_scal_loss(up, gt),
    }


@pytest.mark.parametrize("upsample", [True, False])
@pytest.mark.parametrize("chunks", [1, 2, 4])
def test_streaming_matches_monolithic(upsample, chunks):
    logits, gt = _case(upsample=upsample)
    cw = class_weights_from_frequencies()
    ref = _monolithic(logits, gt, cw)
    got = streaming_voxel_losses(logits, gt, cw, chunks)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )


def test_streaming_gradients_match():
    logits, gt = _case(x=4, y=8, z=4, seed=3)
    cw = class_weights_from_frequencies()

    def total_ref(lg):
        t = _monolithic(lg, gt, cw)
        return t["ce"] + t["sem_scal"] + t["geo_scal"]

    def total_stream(lg):
        t = streaming_voxel_losses(lg, gt, cw, 2)
        return t["ce"] + t["sem_scal"] + t["geo_scal"]

    g_ref = jax.grad(total_ref)(logits)
    g_str = jax.grad(total_stream)(logits)
    np.testing.assert_allclose(
        np.asarray(g_str), np.asarray(g_ref), rtol=5e-4, atol=1e-7
    )


def test_streaming_bf16_logits_and_jit():
    logits, gt = _case(x=4, seed=5)
    cw = class_weights_from_frequencies()
    ref = _monolithic(logits, gt, cw)
    got = jax.jit(
        lambda lg: streaming_voxel_losses(lg, gt, cw, 4)
    )(logits.astype(jnp.bfloat16))
    for k in ref:
        # bf16 input rounding dominates; the monolithic path at bf16 agrees
        # to the same tolerance
        mono_bf16 = _monolithic(logits.astype(jnp.bfloat16), gt, cw)
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(mono_bf16[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )


def test_compute_losses_streaming_path():
    logits, gt = _case(x=4)
    cfg = LossConfig(loss_depth_weight=0.0, stream_voxel_chunks=2)
    cfg_ref = LossConfig(loss_depth_weight=0.0)
    outputs = {"output_voxels": [logits]}
    batch = {"gt_occ": gt}
    got = compute_losses(outputs, batch, cfg)
    ref = compute_losses(outputs, batch, cfg_ref)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=2e-5, atol=2e-6,
            err_msg=k,
        )


def test_streaming_rejects_extra_losses():
    logits, gt = _case(x=4)
    cfg = LossConfig(voxel_ohem=0.5, stream_voxel_chunks=2,
                     loss_depth_weight=0.0)
    with pytest.raises(ValueError, match="stream_voxel_chunks"):
        compute_losses({"output_voxels": [logits]}, {"gt_occ": gt}, cfg)


@pytest.mark.slow
def test_streaming_under_spatial_sharding():
    """The scan axis is Y precisely so an X-sharded ('space') logits tensor
    streams locally; the psum'd global sums must match unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from stereoscene_tpu.parallel.mesh import make_mesh

    logits, gt = _case(b=2, x=8, y=16, z=4)
    cw = class_weights_from_frequencies()
    ref = streaming_voxel_losses(logits, gt, cw, 4)

    mesh = make_mesh(8, axes=("data", "space"))
    lg_sh = jax.device_put(
        logits, NamedSharding(mesh, P("data", "space")))
    gt_sh = jax.device_put(gt, NamedSharding(mesh, P("data", "space")))
    got = jax.jit(
        lambda lg, g: streaming_voxel_losses(lg, g, cw, 4)
    )(lg_sh, gt_sh)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=1e-5, atol=1e-6,
            err_msg=k,
        )


def test_streaming_rejects_bad_chunking():
    logits, gt = _case(y=6)
    cw = class_weights_from_frequencies()
    with pytest.raises(ValueError, match="not divisible"):
        streaming_voxel_losses(logits, gt, cw, 4)
