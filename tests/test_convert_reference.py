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


# ---------------------------------------------------------------------------
# Adversarial checkpoint-quirk matrix (round-3 verdict item 6): the first
# contact with a real released .pth must fail loudly on surprises and
# round-trip the known quirks (num_batches_tracked counters, half precision,
# fuse_conv_bn'd weights).
# ---------------------------------------------------------------------------


def _nm_and_sd(tiny_variables, seed=0):
    from stereoscene_tpu.models.efficientnet import scaled_stage_settings

    params, stats = tiny_variables
    _, stages, _ = scaled_stage_settings("b0")
    nm = build_name_map(
        backbone_stage_blocks=[len(s) for s in stages],
        resnet_blocks=(2, 2, 2),
    )
    return nm, synthesize_state_dict(nm, params, stats, seed=seed), params, stats


def test_unexpected_keys_raise_with_hint(tiny_variables):
    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    sd["img_backbone.layers.0.conv.weightt"] = sd[
        "img_backbone.layers.0.conv.weight"
    ]
    with pytest.raises(KeyError) as e:
        convert_reference_checkpoint(sd, nm, params, stats, strict=True)
    msg = str(e.value)
    assert "weightt" in msg          # names the offending key
    assert "closest mapped key" in msg  # readable near-miss hint


def test_num_batches_tracked_and_meta_tolerated(tiny_variables):
    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    sd["img_backbone.layers.0.bn.num_batches_tracked"] = np.int64(1234)
    sd["meta.epoch"] = np.int64(3)
    convert_reference_checkpoint(sd, nm, params, stats, strict=True)


def test_missing_key_readable(tiny_variables):
    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    del sd["img_backbone.layers.0.conv.weight"]
    with pytest.raises(KeyError) as e:
        convert_reference_checkpoint(sd, nm, params, stats, strict=True)
    msg = str(e.value)
    # names both the flax leaf and the absent torch key
    assert "img_backbone/stem/conv/kernel" in msg
    assert "img_backbone.layers.0.conv.weight" in msg


def test_shape_mismatch_raises(tiny_variables):
    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    key = "img_backbone.layers.0.conv.weight"
    sd[key] = np.zeros((7, 3, 3, 3), np.float32)
    with pytest.raises(ValueError, match="shape"):
        convert_reference_checkpoint(sd, nm, params, stats, strict=True)


def test_fp16_checkpoint_roundtrips(tiny_variables):
    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    ref_p, ref_s = convert_reference_checkpoint(sd, nm, params, stats)
    sd16 = {k: np.asarray(v, np.float16) for k, v in sd.items()}
    got_p, got_s = convert_reference_checkpoint(sd16, nm, params, stats)
    for ref_t, got_t in ((ref_p, got_p), (ref_s, got_s)):
        for path, ref_leaf in _flatten(ref_t).items():
            got_leaf = _flatten(got_t)[path]
            assert got_leaf.dtype == np.float32, path
            np.testing.assert_allclose(
                got_leaf, ref_leaf, rtol=2e-3, atol=1e-3, err_msg=path
            )


def _torch_fuse(sd, conv_key, bn_key, eps):
    """Simulate the reference's tools/misc/fuse_conv_bn.py on one pair:
    rescale the conv kernel, attach the fused bias, delete the BN keys."""
    w = np.asarray(sd[f"{conv_key}.weight"], np.float32)
    gamma = np.asarray(sd.pop(f"{bn_key}.weight"), np.float32)
    beta = np.asarray(sd.pop(f"{bn_key}.bias"), np.float32)
    mean = np.asarray(sd.pop(f"{bn_key}.running_mean"), np.float32)
    var = np.asarray(sd.pop(f"{bn_key}.running_var"), np.float32)
    factor = gamma / np.sqrt(var + eps)
    # torch conv weight is [out, in, ...]; transposed conv is [in, out, ...]
    if w.shape[0] == factor.shape[0]:
        scale_shape = (-1,) + (1,) * (w.ndim - 1)
    else:
        scale_shape = (1, -1) + (1,) * (w.ndim - 2)
    sd[f"{conv_key}.weight"] = w * factor.reshape(scale_shape)
    sd[f"{conv_key}.bias"] = beta - factor * mean
    return factor, beta - factor * mean


def test_fused_bn_checkpoint_roundtrips(tiny_variables):
    """A checkpoint saved after fuse_conv_bn (BN keys gone, conv gains a
    bias) converts via adapt_fused_state_dict to a tree that computes the
    same function: kernel keeps the fused scaling, the BN becomes the
    identity affine carrying the fused bias."""
    from stereoscene_tpu.utils.convert_reference import adapt_fused_state_dict

    nm, sd, params, stats = _nm_and_sd(tiny_variables)
    # make the BN stats non-trivial so the fusing actually moves numbers
    rng = np.random.RandomState(42)
    pairs = [
        # (conv torch key, bn torch key, eps) — one of each naming pattern:
        # named conv/bn siblings (backbone, eps=1e-3), numeric Sequential
        # (neck deblock + hourglass deconv), digit-suffixed (BasicBlock,
        # BOTH pairs to exercise the conv1<->bn1 / conv2<->bn2 tie-break)
        ("img_backbone.layers.0.conv", "img_backbone.layers.0.bn", 1e-3),
        ("img_neck.deblocks.1.0", "img_neck.deblocks.1.1", 1e-5),
        ("img_view_transformer.stereo_volume_net.dres2.conv5.0",
         "img_view_transformer.stereo_volume_net.dres2.conv5.1", 1e-5),
        ("img_view_transformer.depth_net.depth_conv.0.conv1",
         "img_view_transformer.depth_net.depth_conv.0.bn1", 1e-5),
        ("img_view_transformer.depth_net.depth_conv.0.conv2",
         "img_view_transformer.depth_net.depth_conv.0.bn2", 1e-5),
    ]
    expected = {}
    for conv_key, bn_key, eps in pairs:
        for stat in ("weight", "running_mean"):
            assert f"{bn_key}.{stat}" in sd, bn_key
        sd[f"{bn_key}.running_mean"] = rng.randn(
            *sd[f"{bn_key}.running_mean"].shape
        ).astype(np.float32)
        sd[f"{bn_key}.running_var"] = (
            rng.rand(*sd[f"{bn_key}.running_var"].shape) + 0.5
        ).astype(np.float32)
        factor, fused_bias = _torch_fuse(sd, conv_key, bn_key, eps)
        expected[bn_key] = (factor, fused_bias, eps,
                            np.asarray(sd[f"{conv_key}.weight"]))

    adapted = adapt_fused_state_dict(sd, nm)
    new_p, new_s = convert_reference_checkpoint(
        adapted, nm, params, stats, strict=True
    )
    flat_p, flat_s = _flatten(new_p), _flatten(new_s)

    # locate each BN's flax paths through the name map and verify identity
    inv_p = {rule[0]: path for path, rule in nm.params.items()}
    inv_s = {rule[0]: path for path, rule in nm.stats.items()}
    for bn_key, (factor, fused_bias, eps, w_fused) in expected.items():
        scale_path = inv_p[f"{bn_key}.weight"]
        bias_path = inv_p[f"{bn_key}.bias"]
        mean_path = inv_s[f"{bn_key}.running_mean"]
        var_path = inv_s[f"{bn_key}.running_var"]
        np.testing.assert_allclose(flat_p[scale_path], 1.0, err_msg=bn_key)
        np.testing.assert_allclose(
            flat_p[bias_path], fused_bias, rtol=1e-6, err_msg=bn_key
        )
        np.testing.assert_allclose(flat_s[mean_path], 0.0, err_msg=bn_key)
        np.testing.assert_allclose(
            flat_s[var_path], 1.0 - eps, rtol=1e-6, err_msg=bn_key
        )


def test_fused_bn_ambiguous_candidates_raise():
    """Two equal-score fused-conv bias candidates under one parent must
    raise, not silently install the first beta; and the width filter
    (target_stats) disambiguates candidates of different widths
    (advisor round-4 finding)."""
    import pytest

    from stereoscene_tpu.utils.convert_reference import (
        NameMap, adapt_fused_state_dict,
    )

    nm = NameMap()
    # two bias-free convs + one BN, all siblings under torch module "m";
    # neither conv name carries a digit matching the BN, so both candidates
    # tie on (index-match=0, lcp=len("m."))
    nm.raw_conv("convA", "m.convA", 2, bias=False)
    nm.raw_conv("convB", "m.convB", 2, bias=False)
    nm.batchnorm("norm", "m.norm")

    def make_sd(width_a, width_b):
        rng = np.random.RandomState(0)
        return {
            "m.convA.weight": rng.randn(width_a, 3, 1, 1).astype(np.float32),
            "m.convA.bias": rng.randn(width_a).astype(np.float32),
            "m.convB.weight": rng.randn(width_b, 3, 1, 1).astype(np.float32),
            "m.convB.bias": rng.randn(width_b).astype(np.float32),
            # no m.norm.* keys: the BN was fused away
        }

    with pytest.raises(ValueError, match="ambiguous"):
        adapt_fused_state_dict(make_sd(8, 8), nm)

    # width filter: with target_stats pinning the BN width to 8, the
    # width-4 candidate is skipped and convB's bias lands in the beta
    sd = make_sd(4, 8)
    stats_tree = {
        "norm": {"BatchNorm_0": {
            "mean": np.zeros(8, np.float32), "var": np.ones(8, np.float32),
        }}
    }
    adapted = adapt_fused_state_dict(sd, nm, target_stats=stats_tree)
    np.testing.assert_array_equal(adapted["m.norm.bias"], sd["m.convB.bias"])
    assert "m.convA.bias" in adapted  # untouched, reported by convert()

    # equal widths + target_stats: still ambiguous, still raises
    with pytest.raises(ValueError, match="ambiguous"):
        adapt_fused_state_dict(make_sd(8, 8), nm, target_stats=stats_tree)
