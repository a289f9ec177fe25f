"""Mid-shape golden parity (VERDICT round-2 item 7).

The tiny-config parity harness can't exercise shape-dependent behavior:
TF-SAME asymmetric padding at realistic aspect ratios, the D=56 disparity ->
depth warp interpolation, and voxel binning on a non-degenerate 64x64x8 grid
(128x128x16 supervision). This runs the same converter-roundtrip golden test
at ~quarter flagship scale: input 192x640 (flagship 384x1280), D=56
(flagship 112), grid 64x64x8 with the flagship's 0.8 m voxels.

Slow (~minutes on CPU): the whole file is skipped under
STEREOSCENE_SKIP_SLOW=1.
"""

import dataclasses
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from stereoscene_tpu.models.detector import BEVDepthOccupancy
from stereoscene_tpu.models.efficientnet import scaled_stage_settings
from stereoscene_tpu.utils.convert_reference import (
    build_name_map,
    convert_reference_checkpoint,
)
from tests.test_models import TINY

pytestmark = [
    pytest.mark.slow,  # full tier only: 192x640 mid-shape golden parity
    pytest.mark.skipif(
        os.environ.get("STEREOSCENE_SKIP_SLOW") == "1",
        reason="slow mid-shape parity skipped",
    ),
]

# quarter-flagship shapes over the tiny channel widths (channel count does
# not change padding/warp/binning behavior; shape does)
MID = dataclasses.replace(
    TINY,
    input_size=(192, 640),
    downsample=8,
    xbound=(0.0, 51.2, 0.8),
    ybound=(-25.6, 25.6, 0.8),
    zbound=(-2.0, 4.4, 0.8),
    dbound=(2.0, 30.0, 0.5),  # D = 56
    numC_Trans=8,
    attention_chunk=256,
)


def _mid_batch(b=1, rng=None):
    rng = rng or np.random.RandomState(0)
    h, w = MID.input_size
    eye3 = np.broadcast_to(np.eye(3, dtype=np.float32), (b, 2, 3, 3))
    intrin = np.zeros((b, 2, 3, 4), np.float32)
    intrin[..., 0, 0] = 350.0
    intrin[..., 1, 1] = 350.0
    intrin[..., 0, 2] = w / 2
    intrin[..., 1, 2] = h / 2
    intrin[..., 2, 2] = 1.0
    r = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]], np.float32)
    return {
        "imgs": jnp.asarray(rng.randn(b, 2, h, w, 3).astype(np.float32)),
        "rots": jnp.asarray(np.broadcast_to(r, (b, 2, 3, 3)).copy()),
        "trans": jnp.zeros((b, 2, 3)),
        "intrins": jnp.asarray(intrin),
        "post_rots": jnp.asarray(eye3.copy()),
        "post_trans": jnp.zeros((b, 2, 3)),
        "bda": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3))
        ),
        # calib chosen so disparity positions hit fractional interpolation
        # across the D=56 range (flagship-style fx * baseline)
        "calib": jnp.asarray(np.full((b,), 350.0 * 0.54, np.float32)),
    }


@pytest.fixture(scope="module")
def mid_parity():
    from tests.torch_oracle import TorchStereoScene, randomize_state

    batch = _mid_batch(b=1, rng=np.random.RandomState(11))

    torch_model = TorchStereoScene(MID).eval()
    randomize_state(torch_model, seed=13)
    tb = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in batch.items()}
    with torch.no_grad():
        out_t = torch_model(tb)

    model = BEVDepthOccupancy(cfg=MID)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    _, stages, _ = scaled_stage_settings(MID.backbone_arch)
    name_map = build_name_map([len(s) for s in stages])
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert_reference_checkpoint(
        sd, name_map, zeros["params"], zeros["batch_stats"]
    )
    out_j = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    return out_t, out_j


def test_midshape_depth_prob_parity(mid_parity):
    """Covers D=56 warp interpolation + TF-SAME padding at 192x640."""
    out_t, out_j = mid_parity
    ref = out_t["depth_prob"].numpy()
    got = np.asarray(out_j["depth_prob"], np.float32)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=0)


def test_midshape_occupancy_logits_parity(mid_parity):
    """Covers 64x64x8-grid voxel binning + the full graph at mid shapes."""
    out_t, out_j = mid_parity
    ref = out_t["output_voxels"].numpy()
    got = np.transpose(
        np.asarray(out_j["output_voxels"][0], np.float32), (0, 4, 1, 2, 3)
    )
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-3, rtol=0)
