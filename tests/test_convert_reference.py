"""Completeness + round-trip test of the full reference->flax name map:
every leaf of the detector's param/stat trees must be mapped, and layout
transforms must invert exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stereoscene_tpu.models.detector import BEVDepthOccupancy
from stereoscene_tpu.models.efficientnet import scaled_stage_settings
from stereoscene_tpu.utils.convert_reference import (
    _flatten,
    build_name_map,
    convert_reference_checkpoint,
    synthesize_state_dict,
)


@pytest.fixture(scope="module")
def tiny_variables():
    from tests.test_models import TINY, _tiny_batch

    model = BEVDepthOccupancy(cfg=TINY)
    batch = _tiny_batch()
    variables = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    params = jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), variables["params"]
    )
    stats = jax.tree.map(
        lambda s: np.zeros(s.shape, np.float32), variables["batch_stats"]
    )
    return params, stats


def test_name_map_covers_every_leaf(tiny_variables):
    params, stats = tiny_variables
    _, stages, _ = scaled_stage_settings("b0")
    nm = build_name_map(
        backbone_stage_blocks=[len(s) for s in stages],
        resnet_blocks=(2, 2, 2),
    )
    sd = synthesize_state_dict(nm, params, stats, seed=0)
    new_p, new_s = convert_reference_checkpoint(
        sd, nm, params, stats, strict=True
    )

    # converted trees have exactly the target structure
    assert set(_flatten(new_p)) == set(_flatten(params))
    assert set(_flatten(new_s)) == set(_flatten(stats))

    # round trip: synthesize used inverse transforms on random arrays; the
    # forward conversion must reproduce those arrays exactly
    rng = np.random.RandomState(0)
    for flat_t, rules in ((_flatten(params), nm.params),
                          (_flatten(stats), nm.stats)):
        for path, leaf in flat_t.items():
            expected = rng.randn(*np.asarray(leaf).shape).astype(np.float32)
            got = _flatten(new_p if rules is nm.params else new_s)[path]
            np.testing.assert_allclose(got, expected, atol=1e-6,
                                       err_msg=path)
