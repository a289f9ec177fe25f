import numpy as np
import jax.numpy as jnp

from stereoscene_tpu.core import (
    HungarianAssigner3D,
    decode_nms_free,
    denormalize_bbox,
    normalize_bbox,
)


def test_bbox_normalize_roundtrip():
    rng = np.random.RandomState(0)
    boxes = np.concatenate(
        [
            rng.uniform(-50, 50, (5, 3)),          # center
            rng.uniform(0.5, 10, (5, 3)),          # size
            rng.uniform(-np.pi, np.pi, (5, 1)),    # rot
            rng.uniform(-5, 5, (5, 2)),            # velocity
        ],
        axis=1,
    ).astype(np.float32)
    normed = normalize_bbox(jnp.asarray(boxes))
    back = np.asarray(denormalize_bbox(normed))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-4)


def test_assigner_prefers_matching_boxes():
    rng = np.random.RandomState(1)
    b, q, t, c, d = 1, 4, 2, 5, 10
    gt_boxes = rng.randn(b, t, d).astype(np.float32)
    gt_labels = np.array([[1, 3]], np.int32)
    gt_valid = np.array([[True, True]])

    # queries 2 and 0 exactly predict targets 0 and 1 respectively
    preds = rng.randn(b, q, d).astype(np.float32) * 5
    preds[0, 2] = gt_boxes[0, 0]
    preds[0, 0] = gt_boxes[0, 1]
    cls_logits = np.full((b, q, c), -3.0, np.float32)
    cls_logits[0, 2, 1] = 5.0
    cls_logits[0, 0, 3] = 5.0

    assigner = HungarianAssigner3D()
    assign = np.asarray(
        assigner.assign(
            jnp.asarray(cls_logits), jnp.asarray(preds),
            jnp.asarray(gt_labels), jnp.asarray(gt_boxes),
            jnp.asarray(gt_valid),
        )
    )
    assert assign[0, 2] == 0
    assert assign[0, 0] == 1


def test_nms_free_decode():
    rng = np.random.RandomState(2)
    b, q, c = 1, 6, 4
    cls_logits = rng.randn(b, q, c).astype(np.float32)
    cls_logits[0, 3, 2] = 8.0  # dominant detection
    boxes = np.zeros((b, q, 8), np.float32)
    boxes[..., 3:6] = 0.0  # log-size 0 -> size 1
    boxes[..., 7] = 1.0    # cos
    boxes[0, 3, :3] = [5.0, -2.0, 0.5]

    out = decode_nms_free(
        jnp.asarray(cls_logits), jnp.asarray(boxes), max_num=3
    )
    assert out["scores"].shape == (1, 3)
    assert int(out["labels"][0, 0]) == 2
    np.testing.assert_allclose(
        np.asarray(out["boxes"][0, 0, :3]), [5.0, -2.0, 0.5], atol=1e-5
    )
    assert bool(out["valid"][0, 0])


def test_batched_nms():
    from stereoscene_tpu.core.bbox3d import batched_nms

    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # overlaps box 0, same class -> suppressed
        [1, 1, 11, 11],    # overlaps box 0, DIFFERENT class -> kept
        [50, 50, 60, 60],  # far away -> kept
    ], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.asarray([0, 0, 1, 0])
    keep = np.asarray(batched_nms(boxes, scores, labels, iou_threshold=0.5))
    np.testing.assert_array_equal(keep, [True, False, True, True])
