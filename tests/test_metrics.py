import numpy as np
import jax.numpy as jnp

from stereoscene_tpu import metrics


def _naive_reference(pred, target, num_classes):
    """Direct transcription of the reference counting semantics
    (ssc_metric.py:104-169): ignore voxels are zeroed in both arrays."""
    pred = pred.copy()
    target = target.copy()
    pred[target == 255] = 0
    target[target == 255] = 0

    bp = (pred > 0).astype(np.int64)
    bt = (target > 0).astype(np.int64)
    comp_tp = np.sum((bt == 1) & (bp == 1))
    comp_fp = np.sum((bt != 1) & (bp == 1))
    comp_fn = np.sum((bt == 1) & (bp != 1))

    tps = np.zeros(num_classes)
    fps = np.zeros(num_classes)
    fns = np.zeros(num_classes)
    for j in range(num_classes):
        tps[j] = np.sum((target == j) & (pred == j))
        fps[j] = np.sum((target != j) & (pred == j))
        fns[j] = np.sum((target == j) & (pred != j))
    return comp_tp, comp_fp, comp_fn, tps, fps, fns


def test_update_matches_reference_counts():
    rng = np.random.RandomState(3)
    num_classes = 20
    pred = rng.randint(0, num_classes, size=(2, 16, 16, 4))
    target = rng.randint(0, num_classes, size=(2, 16, 16, 4))
    target[rng.rand(*target.shape) < 0.2] = 255

    state = metrics.empty_state(num_classes)
    state = metrics.update_state(state, jnp.asarray(pred), jnp.asarray(target))

    ref = _naive_reference(pred, target, num_classes)
    comp_tp, comp_fp, comp_fn, tps, fps, fns = ref

    # The reference counts masked voxels as (0, 0) pairs, adding them to
    # class-0 tp and binary TN; our masked-out version differs only in the
    # class-0 tp count, which no reported metric uses. Check classes 1:.
    np.testing.assert_allclose(np.asarray(state["tps"])[1:], tps[1:])
    np.testing.assert_allclose(np.asarray(state["fps"])[1:], fps[1:])
    np.testing.assert_allclose(np.asarray(state["fns"])[1:], fns[1:])
    np.testing.assert_allclose(float(state["completion_tp"]), comp_tp)
    np.testing.assert_allclose(float(state["completion_fp"]), comp_fp)
    np.testing.assert_allclose(float(state["completion_fn"]), comp_fn)


def test_perfect_prediction_scores():
    rng = np.random.RandomState(0)
    target = rng.randint(0, 20, size=(1, 8, 8, 4))
    state = metrics.empty_state()
    state = metrics.update_state(state, jnp.asarray(target), jnp.asarray(target))
    scores = metrics.compute(state)
    assert float(scores["iou"]) == 1.0
    assert float(scores["precision"]) == 1.0
    assert float(scores["iou_ssc_mean"]) > 0.999


def test_evaluate_dict_keys():
    state = metrics.empty_state()
    pred = jnp.zeros((1, 4, 4, 2), jnp.int32)
    tgt = jnp.ones((1, 4, 4, 2), jnp.int32)
    state = metrics.update_state(state, pred, tgt)
    from stereoscene_tpu.losses import KITTI_CLASS_NAMES

    out = metrics.evaluate_dict(state, KITTI_CLASS_NAMES)
    assert "semkitti_SC_IoU" in out
    assert "semkitti_SSC_mIoU" in out
    assert "semkitti_combined_IoU" in out
    assert out["semkitti_combined_IoU"] == (
        out["semkitti_SC_IoU"] + out["semkitti_SSC_mIoU"]
    )
