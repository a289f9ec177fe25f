import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.models.mask2former_occ import (
    Mask2FormerOccHead,
    hungarian_match,
    mask2former_loss,
    semantic_inference,
)


def test_head_shapes():
    rng = np.random.RandomState(0)
    head = Mask2FormerOccHead(num_queries=8, embed_dim=16, num_layers=2,
                              num_classes=20)
    feats = jnp.asarray(rng.randn(1, 8, 8, 4, 12).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    assert out["cls_logits"].shape == (1, 8, 21)
    assert out["mask_logits"].shape == (1, 8, 8, 8, 4)
    sem = semantic_inference(out["cls_logits"],
                             out["mask_logits"].reshape(1, 8, -1).reshape(
                                 1, 8, 8, 8, 4))
    assert sem.shape == (1, 8, 8, 4, 20)


def test_hungarian_match_identity():
    # diagonal-dominant cost -> identity assignment
    cost = jnp.asarray(
        (np.ones((1, 4, 4)) - np.eye(4)[None] + 0.01).astype(np.float32)
    )
    assign = np.asarray(hungarian_match(cost))
    np.testing.assert_array_equal(assign[0], [0, 1, 2, 3])


def test_loss_decreases_for_correct_prediction():
    rng = np.random.RandomState(1)
    b, qn, t, x, y, z = 1, 4, 2, 4, 4, 2
    masks = np.zeros((b, t, x, y, z), np.float32)
    masks[0, 0, :2] = 1
    masks[0, 1, 2:] = 1
    classes = np.array([[3, 7]], np.int32)
    valid = np.array([[True, True]])

    v = x * y * z
    # "good" prediction: queries 0/1 match targets, confident classes
    good_masks = np.full((b, qn, x, y, z), -6.0, np.float32)
    good_masks[0, 0][masks[0, 0] > 0] = 6.0
    good_masks[0, 1][masks[0, 1] > 0] = 6.0
    good_cls = np.full((b, qn, 21), -4.0, np.float32)
    good_cls[0, 0, 3] = 6.0
    good_cls[0, 1, 7] = 6.0
    good_cls[0, 2, 20] = 6.0  # no-object
    good_cls[0, 3, 20] = 6.0

    bad_masks = rng.randn(b, qn, x, y, z).astype(np.float32)
    bad_cls = rng.randn(b, qn, 21).astype(np.float32)

    def total(cls_l, mask_l):
        out = {
            "cls_logits": jnp.asarray(cls_l),
            "mask_logits": jnp.asarray(mask_l),
        }
        losses = mask2former_loss(
            out, jnp.asarray(masks), jnp.asarray(classes), jnp.asarray(valid)
        )
        return sum(float(v) for v in losses.values())

    assert total(good_cls, good_masks) < total(bad_cls, bad_masks)
