"""Tests for the present-but-inactive subsystems: CRP3D, imgseg head,
grid mask in the detector, and point-branch OccHead."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.crp3d import CPMegaVoxels, crp_relation_loss
from stereoscene_tpu.models.occhead import OccHead, trilinear_point_sample


def test_cp_mega_voxels_shapes_and_loss():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 8, 8, 4, 6).astype(np.float32))
    mod = CPMegaVoxels(channels=6, mega_shape=(4, 4, 2), n_relations=4,
                       norm_groups=2)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out, logits = mod.apply(variables, x)
    assert out.shape == x.shape
    assert logits.shape == (1, 4, 8 * 8 * 4, 4 * 4 * 2)

    targets = jnp.asarray(rng.rand(1, 4, 256, 32) < 0.3)
    loss = crp_relation_loss(logits, targets)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_detector_with_optional_subsystems():
    from tests.test_models import TINY, _tiny_batch
    import dataclasses

    from stereoscene_tpu.models.detector import BEVDepthOccupancy

    cfg = dataclasses.replace(
        TINY, use_grid_mask=True, imgseg=True, imgseg_class=20, crp3d=True,
        crp_mega_shape=(2, 2, 1),  # must divide the stage-2 grid (2, 2, 1)
    )
    model = BEVDepthOccupancy(cfg=cfg)
    batch = _tiny_batch()
    variables = model.init(
        jax.random.PRNGKey(0), batch, train=False,
    )
    out, mutated = model.apply(
        variables, batch, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out["imgseg_logits"].shape[-1] == 20
    assert out["crp_logits"] is not None
    assert bool(jnp.all(jnp.isfinite(out["output_voxels"][0])))


def test_trilinear_point_sample_center_value():
    vol = jnp.zeros((4, 4, 4, 2))
    vol = vol.at[1, 1, 1].set(jnp.asarray([3.0, 5.0]))
    # normalized coords of voxel center (1,1,1) with align_corners=False:
    # x = (2*i + 1)/dim - 1
    p = jnp.asarray([[(2 * 1 + 1) / 4 - 1] * 3])
    out = trilinear_point_sample(vol, p)
    np.testing.assert_allclose(np.asarray(out[0]), [3.0, 5.0], atol=1e-5)


def test_occhead_point_branch():
    rng = np.random.RandomState(1)
    head = OccHead(
        in_channels=[16], out_channel=20, num_level=1, norm_groups=4,
        supervise_points=True, sampling_img_feats=True, soft_weights=True,
        in_img_channels=8,
    )
    voxel_feats = [jnp.asarray(rng.randn(2, 8, 8, 4, 16).astype(np.float32))]
    points = jnp.asarray(rng.uniform(-1, 1, (2, 64, 3)).astype(np.float32))
    img_feats = jnp.asarray(rng.randn(2, 6, 10, 8).astype(np.float32))
    points_uv = jnp.asarray(rng.uniform(-1, 1, (2, 64, 2)).astype(np.float32))

    variables = head.init(
        jax.random.PRNGKey(0), voxel_feats, points, img_feats, points_uv
    )
    out = head.apply(variables, voxel_feats, points, img_feats, points_uv)
    assert out["output_points"].shape == (2, 64, 20)
    assert bool(jnp.all(jnp.isfinite(out["output_points"])))


def test_semkitti_depthnet_variant():
    """DepthNet(norm_mlp=False, block_norm='gn') is the reference's
    SemKITTIDepthNet (semkitti_depthnet.py:171-233): no GN on the camera
    embedding, GN BasicBlocks; output layout [D | context] unchanged."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from stereoscene_tpu.models.depth_net import DepthNet

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 16, 24).astype(np.float32))
    mlp = jnp.asarray(rng.randn(2, 30).astype(np.float32))
    net = DepthNet(
        mid_channels=24, context_channels=8, depth_channels=16,
        cam_channels=30, norm_mlp=False, block_norm="gn",
    )
    variables = net.init(jax.random.PRNGKey(0), x, mlp)
    # no 'bn' (camera-embedding GN) param, GN blocks instead of BN
    assert "bn" not in variables["params"]
    assert "GroupNorm_0" in variables["params"]["block0"]["bn1"]
    assert "batch_stats" not in variables or not any(
        "block0" in k for k in variables.get("batch_stats", {})
    )
    out = net.apply(variables, x, mlp)
    assert out.shape == (2, 8, 16, 16 + 8)
    assert bool(jnp.all(jnp.isfinite(out)))
