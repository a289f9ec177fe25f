"""Static splat plans (ops/splat_plan.py) must reproduce the dynamic
scatter path exactly, including out-of-bounds dropping and batch plumbing
through the detector."""

import numpy as np
import jax
import jax.numpy as jnp

import __graft_entry__ as graft
from stereoscene_tpu.ops.splat_plan import (
    SplatPlanCache,
    build_plan,
    plan_bounds,
    plan_budget,
)
from stereoscene_tpu.ops.voxel_pool import (
    lift_splat,
    lift_splat_static,
    segment_sum_bounds,
    voxel_pool_scatter,
)


def test_static_plan_matches_scatter():
    rng = np.random.RandomState(0)
    d, fh, fw, c = 6, 4, 5, 8
    grid = (8, 8, 4)
    nvox = int(np.prod(grid))
    p = d * fh * fw
    # ~40% in-bounds, like the real frustum
    ranks = np.where(
        rng.rand(p) < 0.4, rng.randint(0, nvox, p), nvox
    ).astype(np.int32)
    dp = rng.rand(1, d, fh, fw).astype(np.float32)
    feat = rng.randn(1, fh, fw, c).astype(np.float32)

    ref = lift_splat(jnp.asarray(dp), jnp.asarray(feat),
                     jnp.asarray(ranks[None]), grid)

    order, rs = build_plan(ranks, nvox)
    assert order.shape[0] % 1024 == 0
    out = lift_splat_static(
        jnp.asarray(dp), jnp.asarray(feat),
        jnp.asarray(order[None]), jnp.asarray(rs[None]), grid,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cumsum_bounds_matches_scatter_and_grads():
    """Scatter-free cumsum splat: values AND input grads must match the
    dynamic scatter path for group=1 and group=8 plans."""
    rng = np.random.RandomState(1)
    d, fh, fw, c = 6, 4, 5, 8
    grid = (8, 8, 4)
    nvox = int(np.prod(grid))
    p = d * fh * fw
    ranks = np.where(
        rng.rand(p) < 0.4, rng.randint(0, nvox, p), nvox
    ).astype(np.int32)
    dp = rng.rand(1, d, fh, fw).astype(np.float32)
    feat = rng.randn(1, fh, fw, c).astype(np.float32)

    ref_fn = lambda a, b: lift_splat(  # noqa: E731
        a, b, jnp.asarray(ranks[None]), grid
    ).sum() * 2.0 + (lift_splat(
        a, b, jnp.asarray(ranks[None]), grid) ** 2).sum()
    ref = lift_splat(jnp.asarray(dp), jnp.asarray(feat),
                     jnp.asarray(ranks[None]), grid)
    ref_g = jax.grad(ref_fn, argnums=(0, 1))(
        jnp.asarray(dp), jnp.asarray(feat))

    for g in (1, 8):
        order, rs = build_plan(ranks, nvox, group=g)
        bd = plan_bounds(rs, nvox, group=g)
        args = (jnp.asarray(order[None]), jnp.asarray(rs[None]), grid)

        def run(a, b, args=args, g=g, bd=bd):
            return lift_splat_static(
                a, b, *args, group=g, bounds=jnp.asarray(bd[None])
            )

        out = run(jnp.asarray(dp), jnp.asarray(feat))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        loss = lambda a, b: run(a, b).sum() * 2.0 + (run(a, b) ** 2).sum()  # noqa: E731
        got_g = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(dp), jnp.asarray(feat))
        for gg, rg in zip(got_g, ref_g):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(rg),
                                       rtol=1e-4, atol=1e-4)


def test_segment_sum_bounds_unit():
    """Direct op check incl. empty segments, pad sentinel, jit."""
    vals = jnp.asarray(np.arange(12, dtype=np.float32).reshape(6, 2))
    rk = jnp.asarray(np.array([0, 0, 2, 2, 2, 5], np.int32))  # 5 = sentinel
    nv = 5
    bd = jnp.asarray(plan_bounds(np.asarray(rk), nv))
    out = jax.jit(
        lambda v: segment_sum_bounds(v, rk, bd, nv)
    )(vals)
    expect = np.zeros((5, 2), np.float32)
    expect[0] = [0 + 2, 1 + 3]
    expect[2] = [4 + 6 + 8, 5 + 7 + 9]
    np.testing.assert_allclose(np.asarray(out), expect)
    # backward: dvals[i] = dout[rk[i]], zero for the sentinel row
    dv = jax.grad(
        lambda v: (segment_sum_bounds(v, rk, bd, nv)
                   * jnp.arange(10).reshape(5, 2)).sum()
    )(vals)
    expect_dv = np.array(
        [[0, 1], [0, 1], [4, 5], [4, 5], [4, 5], [0, 0]], np.float32)
    np.testing.assert_allclose(np.asarray(dv), expect_dv)


def test_plan_budget_and_overflow():
    assert plan_budget(1000) % 1024 == 0
    assert plan_budget(1000) >= 1100
    ranks = np.zeros(5000, np.int32)  # all valid, rank 0
    try:
        build_plan(ranks, 64, p_pad=1024)
    except ValueError as e:
        assert "budget" in str(e)
    else:
        raise AssertionError("expected overflow error")


def test_detector_static_plan_end_to_end():
    """Full tiny-model forward: batch with plan == batch without."""
    cfg = graft._tiny_cfg()
    from stereoscene_tpu.models.detector import BEVDepthOccupancy

    model = BEVDepthOccupancy(cfg=cfg)
    batch = graft._make_batch(cfg, b=2)
    variables = jax.jit(lambda k: model.init(k, batch, train=False))(
        jax.random.PRNGKey(0)
    )

    cache = SplatPlanCache(model, int(np.prod(cfg.grid_shape)))
    np_batch = {k: np.asarray(v) for k, v in batch.items()}
    planned = cache.attach(np_batch)
    assert planned["splat_order"].shape[0] == 2
    # second attach hits the per-calib cache (same calib both samples)
    assert len(cache._cache) == 1

    out_dyn = model.apply(variables, batch, train=False)
    planned_j = {k: jnp.asarray(v) for k, v in planned.items()}
    out_sta = model.apply(variables, planned_j, train=False)
    np.testing.assert_allclose(
        np.asarray(out_sta["output_voxels"][0]),
        np.asarray(out_dyn["output_voxels"][0]),
        rtol=2e-4, atol=2e-4,
    )


def test_grad_through_static_plan():
    rng = np.random.RandomState(1)
    d, fh, fw, c = 4, 4, 4, 4
    grid = (4, 4, 4)
    nvox = 64
    p = d * fh * fw
    ranks = np.where(rng.rand(p) < 0.5, rng.randint(0, nvox, p), nvox
                     ).astype(np.int32)
    order, rs = build_plan(ranks, nvox)
    dp = jnp.asarray(rng.rand(1, d, fh, fw), jnp.float32)
    feat = jnp.asarray(rng.randn(1, fh, fw, c), jnp.float32)

    def loss_sta(dp, feat):
        out = lift_splat_static(dp, feat, jnp.asarray(order[None]),
                                jnp.asarray(rs[None]), grid)
        return jnp.sum(out ** 2)

    def loss_dyn(dp, feat):
        out = lift_splat(dp, feat, jnp.asarray(ranks[None]), grid)
        return jnp.sum(out ** 2)

    g_sta = jax.grad(loss_sta, argnums=(0, 1))(dp, feat)
    g_dyn = jax.grad(loss_dyn, argnums=(0, 1))(dp, feat)
    for a, b in zip(g_sta, g_dyn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_grouped_plan_matches_scatter():
    """group-aligned plans (dense pre-reduce + G-x smaller scatter) are
    exact vs the dynamic scatter path."""
    rng = np.random.RandomState(1)
    d, fh, fw, c = 6, 4, 5, 8
    grid = (8, 8, 4)
    nvox = int(np.prod(grid))
    p = d * fh * fw
    ranks = np.where(
        rng.rand(p) < 0.4, rng.randint(0, nvox, p), nvox
    ).astype(np.int32)
    dp = rng.rand(1, d, fh, fw).astype(np.float32)
    feat = rng.randn(1, fh, fw, c).astype(np.float32)

    ref = lift_splat(jnp.asarray(dp), jnp.asarray(feat),
                     jnp.asarray(ranks[None]), grid)

    for g in (4, 8):
        order, rs = build_plan(ranks, nvox, group=g)
        assert order.shape[0] % g == 0
        # no group straddles a voxel boundary
        gr = rs.reshape(-1, g)
        assert (gr == gr[:, :1]).all()
        out = lift_splat_static(
            jnp.asarray(dp), jnp.asarray(feat),
            jnp.asarray(order[None]), jnp.asarray(rs[None]), grid, group=g,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_plan_cache_group_from_model_cfg():
    """SplatPlanCache reads splat_group from the detector cfg so the host
    plan and the device path always agree, and refuses a conflicting
    explicit group (ADVICE r3: the compiled splat uses the static cfg
    value, so a cache built with another group is silently wrong)."""
    import pytest

    import dataclasses

    from stereoscene_tpu.models.detector import BEVDepthOccupancy

    # pin the group explicitly rather than relying on the detector default
    # (splat_group=8, the round-4 in-graph A/B winner, detector.py) so the
    # cache/cfg-agreement invariant stays exercised even if the default moves
    cfg = dataclasses.replace(graft._tiny_cfg(), splat_group=8)
    model = BEVDepthOccupancy(cfg=cfg)
    g = model.cfg.splat_group
    cache = SplatPlanCache(model, 8 * 8 * 4)
    assert cache.group == g
    assert SplatPlanCache(model, 8 * 8 * 4, group=g).group == g
    with pytest.raises(ValueError, match="splat_group"):
        SplatPlanCache(model, 8 * 8 * 4, group=1)


def test_build_plan_group_validation():
    """Invalid group/p_pad combinations fail fast with readable errors
    (ADVICE r3: a non-divisor group used to surface as an opaque reshape
    trace error in the grouped device path)."""
    import pytest

    from stereoscene_tpu.ops.splat_plan import validate_plan_group

    ranks = np.sort(np.random.RandomState(0).randint(0, 64, 200)).astype(
        np.int32
    )
    with pytest.raises(ValueError, match="divide"):
        build_plan(ranks, 64, group=3)
    with pytest.raises(ValueError, match="multiple of splat group"):
        build_plan(ranks, 64, p_pad=1028, group=8)
    # a group-1 plan mislabeled as group-8 is caught by the host validator
    order, rs = build_plan(ranks, 64)
    with pytest.raises(ValueError, match="straddle"):
        validate_plan_group(rs, 8)
    # a genuinely grouped plan passes
    order8, rs8 = build_plan(ranks, 64, group=8)
    validate_plan_group(rs8, 8)
