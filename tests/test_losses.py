"""Loss parity tests against torch (CPU) transcriptions of the reference
formulas (projects/mmdet3d_plugin/utils/semkitti.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from stereoscene_tpu import losses


def _rand_case(rng, b=2, x=6, y=5, z=4, c=20, ignore_frac=0.15):
    logits = rng.randn(b, x, y, z, c).astype(np.float32)
    target = rng.randint(0, c, size=(b, x, y, z))
    target[rng.rand(b, x, y, z) < ignore_frac] = 255
    return logits, target


def test_ce_ssc_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits, target = _rand_case(rng)
    weights = losses.class_weights_from_frequencies()

    ours = float(
        losses.ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target), weights)
    )

    t_logits = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    t_target = torch.tensor(target).long()
    crit = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weights), ignore_index=255, reduction="mean"
    )
    ref = float(crit(t_logits, t_target))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _torch_geo_scal(logits, target):
    pred = F.softmax(torch.tensor(logits).permute(0, 4, 1, 2, 3), dim=1)
    ssc_target = torch.tensor(target)
    empty_probs = pred[:, 0]
    nonempty_probs = 1 - empty_probs
    mask = ssc_target != 255
    nonempty_target = (ssc_target != 0)[mask].float()
    nonempty_probs = nonempty_probs[mask]
    empty_probs = empty_probs[mask]
    intersection = (nonempty_target * nonempty_probs).sum()
    precision = intersection / nonempty_probs.sum()
    recall = intersection / nonempty_target.sum()
    spec = ((1 - nonempty_target) * empty_probs).sum() / (1 - nonempty_target).sum()
    return float(
        F.binary_cross_entropy(precision, torch.ones_like(precision))
        + F.binary_cross_entropy(recall, torch.ones_like(recall))
        + F.binary_cross_entropy(spec, torch.ones_like(spec))
    )


def test_geo_scal_loss_matches_torch():
    rng = np.random.RandomState(1)
    logits, target = _rand_case(rng)
    ours = float(losses.geo_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = _torch_geo_scal(logits, target)
    np.testing.assert_allclose(ours, ref, rtol=2e-4)


def _torch_sem_scal(logits, target):
    pred = F.softmax(torch.tensor(logits).permute(0, 4, 1, 2, 3), dim=1)
    ssc_target = torch.tensor(target)
    mask = ssc_target != 255
    loss, count = 0.0, 0.0
    for i in range(pred.shape[1]):
        p = pred[:, i][mask]
        tgt = ssc_target[mask]
        completion = (tgt == i).float()
        if completion.sum() > 0:
            count += 1.0
            nominator = (p * completion).sum()
            loss_class = 0.0
            if p.sum() > 0:
                precision = nominator / p.sum()
                loss_class += float(
                    F.binary_cross_entropy(precision, torch.ones_like(precision))
                )
            if completion.sum() > 0:
                recall = nominator / completion.sum()
                loss_class += float(
                    F.binary_cross_entropy(recall, torch.ones_like(recall))
                )
            if (1 - completion).sum() > 0:
                specificity = ((1 - p) * (1 - completion)).sum() / (
                    (1 - completion).sum()
                )
                loss_class += float(
                    F.binary_cross_entropy(specificity, torch.ones_like(specificity))
                )
            loss += loss_class
    return loss / count


def test_sem_scal_loss_matches_torch():
    rng = np.random.RandomState(2)
    logits, target = _rand_case(rng)
    ours = float(losses.sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = _torch_sem_scal(logits, target)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_sem_scal_handles_missing_classes():
    rng = np.random.RandomState(5)
    logits = rng.randn(1, 4, 4, 2, 20).astype(np.float32)
    target = np.full((1, 4, 4, 2), 3)  # only class 3 present
    ours = float(losses.sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))
    ref = _torch_sem_scal(logits, target)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ohem_matches_torch():
    rng = np.random.RandomState(4)
    logits, target = _rand_case(rng, b=2, x=8, y=4, z=2)
    weights = losses.class_weights_from_frequencies()
    ours = float(
        losses.ohem_ce_ssc_loss(
            jnp.asarray(logits), jnp.asarray(target), weights, top_k=0.25
        )
    )

    # torch transcription (semkitti.py:151-185)
    t_logits = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    t_target = torch.tensor(target).long()
    crit = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weights), ignore_index=255, reduction="none"
    )
    loss = crit(t_logits, t_target)
    flatten_loss = loss.flatten(1)
    flatten_target = t_target.flatten(1)
    topk_losses, norm_weights = 0.0, 0.0
    w = torch.tensor(weights)
    for idx in range(loss.shape[0]):
        ft = flatten_target[idx]
        valid = ft != 255
        fl = flatten_loss[idx, valid]
        nw = w[ft[valid]]
        tk, ti = torch.topk(fl, int(fl.shape[0] * 0.25))
        topk_losses += tk.sum()
        norm_weights += nw[ti].sum()
    ref = float(topk_losses / torch.clamp_min(norm_weights, 1e-4))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_lovasz_softmax_matches_reference_impl():
    """Compare against a literal numpy transcription of the vendored
    lovasz_softmax (dense_heads/lovasz_softmax.py)."""
    rng = np.random.RandomState(7)
    c = 5
    logits = rng.randn(2, 4, 4, 3, c).astype(np.float32)
    target = rng.randint(0, c, size=(2, 4, 4, 3))
    target[rng.rand(*target.shape) < 0.2] = 255
    probs = np.asarray(jnp.asarray(logits))
    probs = np.exp(probs) / np.exp(probs).sum(-1, keepdims=True)

    ours = float(
        losses.lovasz_softmax(jnp.asarray(probs), jnp.asarray(target), ignore=255)
    )

    # numpy reference
    p = probs.reshape(-1, c)
    t = target.reshape(-1)
    keep = t != 255
    p, t = p[keep], t[keep]
    cls_losses = []
    for ci in range(c):
        fg = (t == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - p[:, ci])
        order = np.argsort(-errors, kind="stable")
        e_sorted = errors[order]
        fg_sorted = fg[order]
        gts = fg_sorted.sum()
        inter = gts - np.cumsum(fg_sorted)
        union = gts + np.cumsum(1 - fg_sorted)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        cls_losses.append((e_sorted * jac).sum())
    ref = float(np.mean(cls_losses))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_bce_depth_loss_matches_torch():
    rng = np.random.RandomState(8)
    b, n, h, w, down, num_d = 1, 1, 16, 32, 8, 12
    dbound = (2.0, 8.0, 0.5)
    gt = np.zeros((b, n, h, w), np.float32)
    mask = rng.rand(b, n, h, w) < 0.1
    gt[mask] = rng.uniform(1.0, 9.0, mask.sum())
    logits = rng.randn(b * n, h // down, w // down, num_d).astype(np.float32)
    probs = np.asarray(jnp.asarray(logits))
    probs = np.exp(probs) / np.exp(probs).sum(-1, keepdims=True)

    ours = float(
        losses.bce_depth_loss(jnp.asarray(gt), jnp.asarray(probs), down, dbound)
    )

    # torch transcription (ViewTransformerLSSVoxel.py:349-388)
    t = torch.tensor(gt)
    td = t.view(b * n, h // down, down, w // down, down, 1)
    td = td.permute(0, 1, 3, 5, 2, 4).contiguous().view(-1, down * down)
    td = torch.where(td == 0.0, 1e5 * torch.ones_like(td), td)
    td = td.min(dim=-1).values.view(b * n, h // down, w // down)
    td = (td - (dbound[0] - dbound[2] / 2)) / dbound[2]
    td = torch.where(
        (td < num_d + 1) & (td >= 0.0), td, torch.zeros_like(td)
    )
    onehot = F.one_hot(td.long(), num_classes=num_d + 1).view(-1, num_d + 1)[:, 1:]
    preds = torch.tensor(probs).reshape(-1, num_d)
    fg = onehot.max(dim=1).values > 0
    ref = float(
        F.binary_cross_entropy(
            preds[fg], onehot[fg].float(), reduction="none"
        ).sum()
        / max(1.0, fg.sum())
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
