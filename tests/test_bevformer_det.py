"""BEVFormer detection stack + nuScenes eval core tests (VERDICT round-1
next-steps item 5): head/decoder shapes, iterative refinement, synthetic
end-to-end train -> decode -> eval producing sane mAP/NDS."""

import numpy as np
import jax
import jax.numpy as jnp

from stereoscene_tpu.core.nuscenes_eval import (
    DetBox,
    accumulate,
    boxes_from_arrays,
    calc_ap,
    evaluate_detections,
)
from stereoscene_tpu.models.bevformer_det import (
    BEVFormerDetector,
    BEVFormerHead,
    bevformer_detection_loss,
    bevformer_get_bboxes,
)


def _mk_box(tok, xyz, wlh=(2.0, 4.0, 1.5), yaw=0.0, vel=(0, 0),
            name="car", score=-1.0):
    return DetBox(sample_token=tok, translation=np.asarray(xyz, float),
                  size=np.asarray(wlh, float), yaw=yaw,
                  velocity=np.asarray(vel, float), detection_name=name,
                  score=score)


def test_eval_perfect_predictions():
    gts = [_mk_box("s0", (1, 2, 0)), _mk_box("s0", (10, -3, 0)),
           _mk_box("s1", (5, 5, 0), name="pedestrian", wlh=(0.6, 0.6, 1.7))]
    preds = [DetBox(**{**g.__dict__, "score": 0.9}) for g in gts]
    m = evaluate_detections(gts, preds, classes=("car", "pedestrian"))
    assert abs(m.mean_ap - 1.0) < 1e-6
    assert abs(m.nd_score - 1.0) < 1e-6
    for k, v in m.tp_errors.items():
        assert v < 1e-6, (k, v)


def test_eval_distance_thresholds_and_fp():
    # one GT; one pred offset by 1.5 m -> misses th 0.5/1.0, hits 2.0/4.0
    gts = [_mk_box("s0", (0, 0, 0))]
    preds = [_mk_box("s0", (1.5, 0, 0), score=0.8)]
    md_05 = accumulate(gts, preds, "car", 0.5)
    md_2 = accumulate(gts, preds, "car", 2.0)
    assert calc_ap(md_05) == 0.0
    assert calc_ap(md_2) > 0.9
    # matched translation error recorded
    assert abs(md_2.trans_err[md_2.max_recall_ind] - 1.5) < 1e-6

    # an extra low-score FP lowers precision but keeps AP > 0
    preds2 = preds + [_mk_box("s0", (30, 30, 0), score=0.2)]
    m = evaluate_detections(gts, preds2, classes=("car",))
    assert 0.0 < m.mean_ap <= 1.0


def test_eval_orientation_and_scale_errors():
    gts = [_mk_box("s0", (0, 0, 0), yaw=0.0, wlh=(2, 4, 2))]
    preds = [_mk_box("s0", (0, 0, 0), yaw=np.pi / 2, wlh=(1, 4, 2),
                     score=0.9)]
    md = accumulate(gts, preds, "car", 2.0)
    i = md.max_recall_ind
    assert abs(md.orient_err[i] - np.pi / 2) < 1e-6
    assert abs(md.scale_err[i] - 0.5) < 1e-6  # half-width box -> IoU 0.5


def test_head_shapes_and_refinement():
    rng = np.random.RandomState(0)
    head = BEVFormerHead(num_classes=4, num_query=12, embed_dim=32,
                         num_decoder_layers=2, num_heads=4)
    bev = jnp.asarray(rng.randn(1, 8 * 8, 32).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), bev, (8, 8))
    out = head.apply(variables, bev, (8, 8))
    assert out["all_cls_scores"].shape == (2, 1, 12, 4)
    assert out["all_bbox_preds"].shape == (2, 1, 12, 10)
    # centers decoded into the pc_range
    pc = head.pc_range
    cx = np.asarray(out["all_bbox_preds"][..., 0])
    assert (cx >= pc[0]).all() and (cx <= pc[3]).all()
    # refinement: layer outputs differ
    assert not np.allclose(np.asarray(out["all_bbox_preds"][0]),
                           np.asarray(out["all_bbox_preds"][1]))


def test_detector_end_to_end_train_decode_eval():
    """Synthetic: one GT box configuration, a few gradient steps reduce the
    loss; decode + eval produce finite, sane metrics."""
    import optax

    rng = np.random.RandomState(0)
    b, n_cam, hw, cin = 1, 2, 8 * 8, 16
    det = BEVFormerDetector(num_classes=2, num_query=8, embed_dim=32,
                            bev_shape=(8, 8), num_encoder_layers=1,
                            num_decoder_layers=2,
                            pc_range=(-10, -10, -2, 10, 10, 2))
    img_feats = jnp.asarray(rng.randn(b, n_cam, hw, cin).astype(np.float32))
    # simple pinhole lidar2img per camera
    k = np.array([[100.0, 0, 32, 0], [0, 100.0, 32, 0], [0, 0, 1, 0]],
                 np.float32)
    lidar2img = jnp.asarray(np.stack([k, k])[None])
    spatial_shapes = [(8, 8)]

    gt_boxes = jnp.asarray(
        np.array([[[2.0, 3.0, 0.0, 2.0, 4.0, 1.5, 0.5, 0.0, 0.0],
                   [-4.0, 1.0, -0.5, 1.0, 1.0, 1.8, -0.3, 0.0, 0.0]]],
                 np.float32))
    gt_labels = jnp.asarray([[0, 1]], np.int32)
    gt_valid = jnp.asarray([[True, True]])

    variables = det.init(jax.random.PRNGKey(0), img_feats, spatial_shapes,
                         lidar2img, (64, 64))

    def loss_fn(params):
        out = det.apply({"params": params}, img_feats, spatial_shapes,
                        lidar2img, (64, 64))
        losses = bevformer_detection_loss(out, gt_boxes, gt_labels, gt_valid,
                                          num_classes=2)
        return sum(losses.values()), losses

    params = variables["params"]
    opt = optax.adam(2e-3)
    state = opt.init(params)
    (first, first_losses) = loss_fn(params)
    assert all(np.isfinite(float(v)) for v in first_losses.values())
    for _ in range(10):
        (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
    (last, _) = loss_fn(params)
    assert float(last) < float(first)

    # decode + evaluate
    out = det.apply({"params": params}, img_feats, spatial_shapes,
                    lidar2img, (64, 64))
    dec = bevformer_get_bboxes(out, max_num=8,
                               post_center_range=(-12, -12, -4, 12, 12, 4))
    boxes = np.asarray(dec["boxes"][0])
    scores = np.asarray(dec["scores"][0])
    labels = np.asarray(dec["labels"][0])
    assert np.isfinite(boxes).all()

    classes = ("car", "pedestrian")
    gts = boxes_from_arrays(
        ["s0", "s0"], np.asarray(gt_boxes[0]), np.asarray(gt_labels[0]),
        classes=classes,
    )
    preds = boxes_from_arrays(
        ["s0"] * len(labels), boxes, labels, scores, classes=classes)
    m = evaluate_detections(gts, preds, classes=classes)
    assert np.isfinite(m.mean_ap) and 0.0 <= m.mean_ap <= 1.0
    assert np.isfinite(m.nd_score) and 0.0 <= m.nd_score <= 1.0
