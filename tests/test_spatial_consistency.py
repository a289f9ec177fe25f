"""GSPMD spatial sharding must be numerically transparent: the detector's
forward with the voxel grid sharded over the 'space' axis (halo exchanges
inserted by the partitioner) must match the unsharded forward."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stereoscene_tpu.models.detector import BEVDepthOccupancy
from stereoscene_tpu.parallel.mesh import make_mesh
from stereoscene_tpu.parallel.spatial import shard_voxels

import pytest

# full tier only: sharded-vs-unsharded grad parity (507 leaves)
pytestmark = pytest.mark.slow


def test_spatial_sharding_matches_unsharded():
    from tests.test_models import TINY, _tiny_batch

    batch = _tiny_batch(b=2)  # data axis = 2 on the (2, 4) mesh
    base_model = BEVDepthOccupancy(cfg=TINY)
    variables = base_model.init(jax.random.PRNGKey(0), batch, train=False)

    ref = jax.jit(
        lambda v, b: base_model.apply(v, b, train=False)["output_voxels"][0]
    )(variables, batch)

    mesh = make_mesh(8, axes=("data", "space"))
    sp_model = BEVDepthOccupancy(
        cfg=TINY, voxel_constraint=lambda v: shard_voxels(v, mesh)
    )
    repl = NamedSharding(mesh, P())
    v_sharded = jax.device_put(variables, repl)
    b_sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))

    out = jax.jit(
        lambda v, b: sp_model.apply(v, b, train=False)["output_voxels"][0]
    )(v_sharded, b_sharded)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_spatial_sharding_gradient_parity():
    """SP TRAIN correctness: gradients of the full loss with the voxel grid
    sharded over 'space' must match the unsharded gradients (GSPMD halo
    exchange transposes are numerically transparent)."""
    from tests.test_models import TINY, _tiny_batch
    from stereoscene_tpu.engine.train import LossConfig, compute_losses

    rng = np.random.RandomState(0)
    batch = _tiny_batch(b=2, rng=rng)
    x, y, z = TINY.grid_shape
    batch = dict(batch)
    batch["gt_occ"] = jnp.asarray(
        rng.randint(0, 20, (2, 2 * x, 2 * y, 2 * z)).astype(np.int32))
    h, w = TINY.input_size
    batch["gt_depth"] = jnp.asarray(
        (rng.rand(2, 2, h, w) < 0.05).astype(np.float32) * 8.0)

    base_model = BEVDepthOccupancy(cfg=TINY)
    variables = base_model.init(jax.random.PRNGKey(0), batch, train=False)
    aux = {k: v for k, v in variables.items() if k != "params"}
    loss_cfg = LossConfig(downsample=TINY.downsample, dbound=TINY.dbound)

    def make_loss(model):
        def loss_fn(params, b):
            out = model.apply({"params": params, **aux}, b, train=False)
            return sum(compute_losses(out, b, loss_cfg).values())
        return loss_fn

    ref_loss, ref_grads = jax.jit(
        jax.value_and_grad(make_loss(base_model))
    )(variables["params"], batch)

    mesh = make_mesh(8, axes=("data", "space"))
    sp_model = BEVDepthOccupancy(
        cfg=TINY, voxel_constraint=lambda v: shard_voxels(v, mesh)
    )
    repl = NamedSharding(mesh, P())
    p_sharded = jax.device_put(variables["params"], repl)
    b_sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    sp_loss, sp_grads = jax.jit(
        jax.value_and_grad(make_loss(sp_model)),
        in_shardings=(repl, NamedSharding(mesh, P("data"))),
        out_shardings=(repl, repl),
    )(p_sharded, b_sharded)

    np.testing.assert_allclose(float(sp_loss), float(ref_loss),
                               rtol=1e-5, atol=1e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_sp = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(sp_grads)
    )
    checked = 0
    for k, g_ref in flat_ref:
        g_sp = flat_sp[jax.tree_util.keystr(k)]
        a = np.asarray(g_sp, np.float64)
        b = np.asarray(g_ref, np.float64)
        # fp32 reduction-order noise across the 8-device mesh re-associates
        # sums, so a few elements per leaf drift by O(1e-3) of the leaf max
        # (and which leaf varies run to run). Compare the relative L2 error
        # per leaf instead: noise averages out well below 1e-3, while the
        # bug this test guards against — GSPMD grouped-conv kernel grads
        # scaled by the unused mesh axis (or garbage) — measures >= 3.0.
        rel_l2 = np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)
        assert rel_l2 < 5e-3, (jax.tree_util.keystr(k), rel_l2)
        # and no single element may be wildly off (2% of the leaf max)
        scale = np.abs(b).max() + 1e-8
        max_err = np.abs(a - b).max() / scale
        assert max_err < 2e-2, (jax.tree_util.keystr(k), max_err)
        checked += 1
    assert checked > 50  # the whole tree was compared


def test_make_mesh_explicit_space():
    mesh = make_mesh(8, axes=("data", "space"), space=2)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 4, "space": 2}
    mesh = make_mesh(8, axes=("data", "space"), space=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "space": 4}
