"""DETR3D-style 3D box core: costs, Hungarian assignment, NMS-free decoding.

Capability rebuild of the reference's core pieces
(ref: projects/mmdet3d_plugin/core/ ~800 LoC: ``HungarianAssigner3D``,
``NMSFreeCoder``, ``BBox3DL1Cost``, bbox normalization utils) used by the
BEVFormer/DETR3D detection alternates. The assignment reuses the host scipy
callback from models/mask2former_occ.py; decoding is a static top-k over
(query, class) scores with range filtering — no NMS, matching the set
prediction formulation.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..models.mask2former_occ import hungarian_match


def normalize_bbox(bboxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 7+] (cx, cy, cz, w, l, h, rot[, vx, vy]) -> regression space
    with log sizes and (sin, cos) rotation (the DETR3D convention)."""
    cx, cy, cz = bboxes[..., 0], bboxes[..., 1], bboxes[..., 2]
    w = jnp.log(jnp.maximum(bboxes[..., 3], 1e-6))
    l = jnp.log(jnp.maximum(bboxes[..., 4], 1e-6))
    h = jnp.log(jnp.maximum(bboxes[..., 5], 1e-6))
    rot = bboxes[..., 6]
    out = [cx, cy, cz, w, l, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        out.extend([bboxes[..., 7], bboxes[..., 8]])
    return jnp.stack(out, axis=-1)


def denormalize_bbox(normed: jnp.ndarray) -> jnp.ndarray:
    rot = jnp.arctan2(normed[..., 6], normed[..., 7])
    out = [
        normed[..., 0], normed[..., 1], normed[..., 2],
        jnp.exp(normed[..., 3]), jnp.exp(normed[..., 4]),
        jnp.exp(normed[..., 5]), rot,
    ]
    if normed.shape[-1] > 8:
        out.extend([normed[..., 8], normed[..., 9]])
    return jnp.stack(out, axis=-1)


def bbox3d_l1_cost(pred: jnp.ndarray, target: jnp.ndarray,
                   weight: float = 1.0) -> jnp.ndarray:
    """Pairwise L1 cost in normalized space: [B, Q, D] x [B, T, D] ->
    [B, Q, T] (ref BBox3DL1Cost)."""
    diff = jnp.abs(pred[:, :, None] - target[:, None, :])
    return weight * jnp.sum(diff, axis=-1)


class HungarianAssigner3D:
    """Class + box-L1 cost assignment (ref HungarianAssigner3D)."""

    def __init__(self, cls_weight: float = 1.0, reg_weight: float = 0.25):
        self.cls_weight = cls_weight
        self.reg_weight = reg_weight

    def assign(
        self,
        cls_logits: jnp.ndarray,     # [B, Q, C]
        bbox_preds: jnp.ndarray,     # [B, Q, D] normalized
        gt_labels: jnp.ndarray,      # [B, T]
        gt_bboxes: jnp.ndarray,      # [B, T, D] normalized
        gt_valid: jnp.ndarray,       # [B, T]
    ) -> jnp.ndarray:
        """Returns assignment [B, Q] (target index or -1)."""
        logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
        b, q, _ = logp.shape
        t = gt_labels.shape[1]
        cost_cls = -jnp.take_along_axis(
            jnp.broadcast_to(logp[:, :, None], (b, q, t, logp.shape[-1])),
            jnp.broadcast_to(
                gt_labels[:, None, :, None], (b, q, t, 1)
            ).astype(jnp.int32),
            axis=-1,
        )[..., 0]
        cost_reg = bbox3d_l1_cost(
            bbox_preds.astype(jnp.float32), gt_bboxes.astype(jnp.float32)
        )
        cost = self.cls_weight * cost_cls + self.reg_weight * cost_reg
        cost = cost + 1e4 * (~gt_valid)[:, None].astype(jnp.float32)
        return hungarian_match(cost)


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    iou_threshold: float = 0.5,
    max_out: int = 100,
) -> jnp.ndarray:
    """Axis-aligned 2D NMS, class-aware (the mmcv ``batched_nms`` equivalent
    used by the maskformer alternates). Static-shape greedy suppression.

    Args:
      boxes: [N, 4] (x1, y1, x2, y2); scores: [N]; labels: [N].
    Returns: keep mask [N] (top-scoring non-suppressed, at most max_out).
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    s = scores[order]
    c = labels[order]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-6)
    same_class = c[:, None] == c[None, :]
    suppress = (iou > iou_threshold) & same_class

    def body(i, keep):
        sup_by_kept = suppress[:, i] & keep[i] & (
            jnp.arange(n) > i
        )
        return jnp.where(sup_by_kept, False, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
    keep_sorted = keep_sorted & (rank < max_out)
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def decode_nms_free(
    cls_logits: jnp.ndarray,
    bbox_preds: jnp.ndarray,
    max_num: int = 100,
    score_threshold: float = 0.0,
    post_center_range: Sequence[float] = (-61.2, -61.2, -10, 61.2, 61.2, 10),
) -> Dict[str, jnp.ndarray]:
    """NMS-free decoding (ref NMSFreeCoder): flat top-k over (query, class)
    sigmoid scores, boxes denormalized, out-of-range boxes score-masked.

    Returns dict of [B, max_num] boxes/scores/labels (static shapes; masked
    entries carry score 0)."""
    scores = jax.nn.sigmoid(cls_logits.astype(jnp.float32))  # [B, Q, C]
    b, qn, c = scores.shape
    flat = scores.reshape(b, qn * c)
    top_scores, top_idx = jax.lax.top_k(flat, max_num)
    query_idx = top_idx // c
    labels = top_idx % c

    boxes = denormalize_bbox(bbox_preds.astype(jnp.float32))
    boxes = jnp.take_along_axis(
        boxes, query_idx[..., None], axis=1
    )  # [B, max_num, 7+]

    lo = jnp.asarray(post_center_range[:3], jnp.float32)
    hi = jnp.asarray(post_center_range[3:], jnp.float32)
    in_range = jnp.all(
        (boxes[..., :3] >= lo) & (boxes[..., :3] <= hi), axis=-1
    )
    keep = in_range & (top_scores > score_threshold)
    return {
        "boxes": boxes,
        "scores": jnp.where(keep, top_scores, 0.0),
        "labels": labels,
        "valid": keep,
    }
