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
