"""Backward parity vs the torch oracle (round-3 verdict item 4).

Forward parity alone cannot catch a divergent backward: this repo carries
five custom VJPs (zpack conv3d models/layers.py, depthwise dK
models/efficientnet.py, fused gwc ops/pallas_gwc.py, zpack deconv, splat),
and a stop-gradient or VJP mistake would train to different weights with
every forward test green. Here the FULL active loss suite (voxel CE +
sem_scal + geo_scal on the trilinearly-upsampled logits + BCE depth loss,
the stereoscene.py:115-122 recipe) is computed on both sides of the golden
harness and dL/dtheta is compared over every parameter leaf:

  torch:  TorchStereoScene (tests/torch_oracle.py) -> torch autograd
  flax:   converter-roundtripped params -> jax.grad of engine.compute_losses

Torch gradients are mapped into the flax layout by pushing them through the
same ``convert_reference_checkpoint`` used for the weights — its transforms
are pure permutations/reshapes, under which gradients transform exactly like
the parameters themselves.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from stereoscene_tpu.engine.train import LossConfig, compute_losses
from stereoscene_tpu.losses import class_weights_from_frequencies
from stereoscene_tpu.models.detector import BEVDepthOccupancy
from stereoscene_tpu.models.efficientnet import scaled_stage_settings
from stereoscene_tpu.utils.convert_reference import (
    build_name_map,
    convert_reference_checkpoint,
)
from tests.test_models import TINY, _tiny_batch

# full tier only: 506-leaf dL/dtheta vs the torch oracle
pytestmark = pytest.mark.slow

_EPS = 1e-12


# ---------------------------------------------------------------------------
# torch transcription of the active loss suite (differentiable; mirrors
# stereoscene_tpu/losses/semkitti.py + losses/depth.py, themselves parity-
# tested against the reference's semkitti.py in tests/test_reference_direct)
# ---------------------------------------------------------------------------


def _t_safe_log(x):
    return torch.clamp(torch.log(torch.clamp(x, min=_EPS)), min=-100.0)


def _torch_geo_scal(logits_cf, target):
    probs = F.softmax(logits_cf, dim=1)
    empty = probs[:, 0].reshape(-1)
    nonempty = 1.0 - empty
    t = target.reshape(-1)
    valid = (t != 255).float()
    nonempty_t = ((t != 0) & (t != 255)).float()
    empty_t = valid - nonempty_t
    nonempty = nonempty * valid
    empty = empty * valid
    inter = (nonempty_t * nonempty).sum()
    precision = inter / torch.clamp(nonempty.sum(), min=_EPS)
    recall = inter / torch.clamp(nonempty_t.sum(), min=_EPS)
    spec = (empty_t * empty).sum() / torch.clamp(empty_t.sum(), min=_EPS)
    return -(_t_safe_log(precision) + _t_safe_log(recall) + _t_safe_log(spec))


def _torch_sem_scal(logits_cf, target):
    c = logits_cf.shape[1]
    probs = F.softmax(logits_cf, dim=1)
    probs = probs.permute(0, 2, 3, 4, 1).reshape(-1, c)
    t = target.reshape(-1)
    valid = (t != 255)
    validf = valid.float()
    completion = (
        t[:, None] == torch.arange(c, device=t.device)[None, :]
    ).float() * validf[:, None]
    probs = probs * validf[:, None]
    nom = (probs * completion).sum(0)
    p_sum = probs.sum(0)
    t_sum = completion.sum(0)
    not_t_sum = validf.sum() - t_sum
    precision = nom / torch.clamp(p_sum, min=_EPS)
    recall = nom / torch.clamp(t_sum, min=_EPS)
    spec_nom = ((1.0 - probs) * (1.0 - completion) * validf[:, None]).sum(0)
    specificity = spec_nom / torch.clamp(not_t_sum, min=_EPS)
    loss_c = torch.where(
        p_sum > 0, -_t_safe_log(precision), torch.zeros_like(p_sum)
    )
    loss_c = loss_c + torch.where(
        t_sum > 0, -_t_safe_log(recall), torch.zeros_like(t_sum)
    )
    loss_c = loss_c + torch.where(
        not_t_sum > 0, -_t_safe_log(specificity), torch.zeros_like(not_t_sum)
    )
    present = (t_sum > 0).float()
    return (loss_c * present).sum() / torch.clamp(present.sum(), min=1.0)


def _torch_bce_depth(gt_depth, depth_prob, downsample, dbound):
    """gt_depth [B, 1, H, W]; depth_prob [B, D, h, w]
    (ref ViewTransformerLSSVoxel.py:349-388)."""
    b, n, h, w = gt_depth.shape
    d = downsample
    num_depth = depth_prob.shape[1]
    x = gt_depth.reshape(b * n, h // d, d, w // d, d)
    x = torch.where(x == 0.0, torch.full_like(x, 1e5), x)
    x = x.amin(dim=(2, 4))
    lo, _, step = dbound
    idx = (x - (lo - step / 2.0)) / step
    in_range = (idx < num_depth + 1) & (idx >= 0.0)
    idx = torch.where(in_range, idx, torch.zeros_like(idx)).long()
    onehot = F.one_hot(idx.reshape(-1), num_depth + 1).float()[:, 1:]
    preds = depth_prob.permute(0, 2, 3, 1).reshape(-1, num_depth)
    fg = (onehot.max(dim=1).values > 0.0).float()
    p = torch.clamp(preds, _EPS, 1.0)
    om = torch.clamp(1.0 - preds, _EPS, 1.0)
    bce = -(
        onehot * torch.clamp(torch.log(p), min=-100.0)
        + (1.0 - onehot) * torch.clamp(torch.log(om), min=-100.0)
    )
    return (bce.sum(dim=1) * fg).sum() / torch.clamp(fg.sum(), min=1.0)


def _torch_total_loss(out, batch, cfg):
    logits = out["output_voxels"]  # [B, C, X, Y, Z]
    gt = batch["gt_occ"].long()
    logits_up = F.interpolate(
        logits, size=tuple(gt.shape[1:]), mode="trilinear",
        align_corners=False,
    )
    weights = torch.from_numpy(class_weights_from_frequencies())
    ce = F.cross_entropy(logits_up, gt, weight=weights, ignore_index=255)
    sem = _torch_sem_scal(logits_up, gt)
    geo = _torch_geo_scal(logits_up, gt)
    depth = _torch_bce_depth(
        batch["gt_depth"][:, :1], out["depth_prob"], cfg.downsample,
        cfg.dbound,
    )
    return ce + sem + geo + depth


def _labeled_batch(b, rng):
    batch = dict(_tiny_batch(b=b, rng=rng))
    x, y, z = TINY.grid_shape
    h, w = TINY.input_size
    batch["gt_occ"] = jnp.asarray(
        np.where(
            rng.rand(b, 2 * x, 2 * y, 2 * z) < 0.1,
            255,
            rng.randint(0, 20, (b, 2 * x, 2 * y, 2 * z)),
        ).astype(np.int32)
    )
    # sparse LiDAR depth hits inside [2, 10) m so some bins are foreground
    batch["gt_depth"] = jnp.asarray(
        ((rng.rand(b, 2, h, w) < 0.07) * (rng.rand(b, 2, h, w) * 7.5 + 2.1))
        .astype(np.float32)
    )
    return batch


@pytest.fixture(scope="module")
def grad_setup():
    from tests.torch_oracle import TorchStereoScene, randomize_state

    rng = np.random.RandomState(5)
    batch = _labeled_batch(b=2, rng=rng)
    loss_cfg = LossConfig(downsample=TINY.downsample, dbound=TINY.dbound)

    # ---- torch side ----
    # Hermetic seeding (round-5 root cause of the round-4 red leaf):
    # randomize_state deliberately KEEPS torch's default weight inits, which
    # draw from the *global* RNG — without this seed the oracle's weights
    # depend on whichever tests ran earlier in the process (full tier vs
    # this file alone differ by O(1) in every conv kernel), so the marginal
    # leaves of the comparison moved between hosts/selections. Seeded, the
    # comparison is one fixed weight draw everywhere.
    torch.manual_seed(0)
    torch_model = TorchStereoScene(TINY).eval()
    randomize_state(torch_model, seed=9)
    tb = {k: torch.from_numpy(np.asarray(v).copy()) for k, v in batch.items()}
    out_t = torch_model(tb)
    total_t = _torch_total_loss(out_t, tb, loss_cfg)
    total_t.backward()

    # ---- flax side: converter-roundtripped params, jax.grad ----
    model = BEVDepthOccupancy(cfg=TINY)
    shapes = jax.eval_shape(
        lambda k: model.init(k, batch, train=False), jax.random.PRNGKey(0)
    )
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), shapes)
    _, stages, _ = scaled_stage_settings(TINY.backbone_arch)
    name_map = build_name_map([len(s) for s in stages])
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params, stats = convert_reference_checkpoint(
        sd, name_map, zeros["params"], zeros["batch_stats"]
    )

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=False
        )
        losses = compute_losses(out, batch, loss_cfg)
        return sum(jax.tree.leaves(losses)), losses

    (total_j, losses_j), grads_j = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )

    # torch grads -> flax layout via the SAME converter (grads transform
    # like weights under its permutation/reshape maps); buffers get zeros
    sd_grads = {
        k: (
            dict(torch_model.named_parameters())[k].grad.detach().numpy()
            if k in dict(torch_model.named_parameters())
            and dict(torch_model.named_parameters())[k].grad is not None
            else np.zeros_like(v)
        )
        for k, v in sd.items()
    }
    grads_t, _ = convert_reference_checkpoint(
        sd_grads, name_map, zeros["params"], zeros["batch_stats"]
    )
    return float(total_t), float(total_j), grads_t, grads_j


def test_total_loss_parity(grad_setup):
    total_t, total_j, _, _ = grad_setup
    assert np.isfinite(total_t) and np.isfinite(total_j)
    np.testing.assert_allclose(total_j, total_t, rtol=2e-3)


def test_gradient_parity_all_leaves(grad_setup):
    """dL/dtheta matches the torch oracle on every parameter leaf.

    Metric (round-5 redesign after the round-4 red leaf): per leaf,

        max|gj - gt|  <=  max(2e-2 * leaf_scale, 1e-4 * global_scale)

    i.e. the usual rtol with an atol floor derived from the gradient field
    itself. Rationale, measured on this harness (tools/probe_grad_leaf.py):
    the round-4 failure (dres4.conv5_deconv.kernel, err 0.021 at leaf scale
    2e-4 => abs diff 4e-6) sat on a leaf ~4 orders below the global grad
    scale (~0.7), where 2% of leaf scale is single-digit-ULP territory for
    f32 backward accumulation — the deconv VJP itself is exact to 3e-15 at
    f64 (probe [1]), and pure reorder (jit vs eager, identical math) already
    moves leaves by up to 2.4e-7 abs (probe [3]); torch's own conv backward
    dispatches different SIMD kernels per host CPU, so cross-host abs noise
    of a few e-6 is expected. The 1e-4*global floor (~7e-5 here) forgives
    exactly that regime while still catching any real defect: a wrong sign,
    permutation, or missing term on any leaf with scale above ~7e-5 — which
    is every leaf that influences training — still fails the rtol branch.
    Leaves below the floor are certified "zero at global precision".
    """
    _, _, grads_t, grads_j = grad_setup
    paths_t = jax.tree_util.tree_leaves_with_path(grads_t)
    paths_j = {
        jax.tree_util.keystr(k): np.asarray(v, np.float32)
        for k, v in jax.tree_util.tree_leaves_with_path(grads_j)
    }
    assert len(paths_t) == len(paths_j) and len(paths_t) > 300
    global_scale = max(
        max(np.abs(np.asarray(g, np.float32)).max() for _, g in paths_t),
        max(np.abs(g).max() for g in paths_j.values()),
    )
    assert global_scale > 1e-2  # a degenerate grad field would hide bugs
    atol = 1e-4 * global_scale
    bad = []
    n_offset = 0
    for k, gt_leaf in paths_t:
        key = jax.tree_util.keystr(k)
        gt_leaf = np.asarray(gt_leaf, np.float32)
        gj = paths_j[key]
        if "conv_offset" in key:
            # DCN offsets are zero-init (reference quirk,
            # ViewTransformerLSSBEVDepth.py:497), so every sample lands on
            # an exact integer grid point where bilinear interpolation is
            # non-differentiable — torch and jax pick different one-sided
            # subgradients. Both must still be (equally) tiny: a genuinely
            # divergent offset path would show macroscopic grads.
            n_offset += 1
            assert max(np.abs(gt_leaf).max(), np.abs(gj).max()) < 1e-3, key
            continue
        scale = max(np.abs(gt_leaf).max(), np.abs(gj).max(), 1e-6)
        absd = np.abs(gj - gt_leaf).max()
        if absd > max(2e-2 * scale, atol):
            bad.append((key, float(absd / scale), float(scale)))
    assert n_offset == 2  # kernel + bias of the single DCN
    assert not bad, (
        f"{len(bad)}/{len(paths_t)} leaves exceed grad tolerance "
        f"(atol floor {atol:.2e}); "
        f"worst: {sorted(bad, key=lambda x: -x[1])[:8]}"
    )
