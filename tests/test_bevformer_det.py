"""BEVFormer detection stack + nuScenes eval core tests (VERDICT round-1
next-steps item 5): head/decoder shapes, iterative refinement, synthetic
end-to-end train -> decode -> eval producing sane mAP/NDS."""

import numpy as np
import pytest
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


@pytest.mark.slow  # full tier: end-to-end training of an inactive family (its unit/shape tests stay in the fast tier); round-5 re-tiering, measured times in README
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


# ---------------------------------------------------------------------------
# temporal plumbing: history queue + can_bus conditioning
# (ref bevformer/detectors/bevformer.py:163-275, modules/transformer.py:121-161)
# ---------------------------------------------------------------------------


def _tiny_det():
    from stereoscene_tpu.models.bevformer_det import BEVFormerDetector

    return BEVFormerDetector(
        num_classes=3, num_query=8, embed_dim=32, bev_shape=(8, 8),
        num_encoder_layers=1, num_decoder_layers=1,
    )


def _tiny_inputs(rng, b=1, t=None):
    n_cam, hw, c = 2, 12, 16
    shape = (b, t, n_cam, hw, c) if t else (b, n_cam, hw, c)
    feats = jnp.asarray(rng.randn(*shape).astype(np.float32))
    l2i_shape = (b, t, n_cam, 3, 4) if t else (b, n_cam, 3, 4)
    l2i = jnp.asarray(
        np.broadcast_to(
            np.array([[100.0, 0, 50, 0], [0, 100, 30, 0], [0, 0, 1, 0]]),
            l2i_shape,
        ).copy()
    )
    return feats, [(3, 4)], l2i, (60, 100)


def test_rotate_bev_quarter_turn():
    from stereoscene_tpu.models.bevformer import rotate_bev

    g = np.zeros((1, 8, 8, 3), np.float32)
    g[0, 1, 2] = 1.0
    out = rotate_bev(
        jnp.asarray(g.reshape(1, 64, 3)), jnp.asarray([90.0]), (8, 8)
    )
    out = np.asarray(out).reshape(8, 8, 3)
    # 90deg CCW about center (3.5, 3.5): (y-3.5, x-3.5)=(-2.5,-1.5) source
    # for output position solving inverse map; just assert mass preserved
    # at a single cell and moved off the original
    assert out.sum() == pytest.approx(3.0, abs=1e-4)
    assert out[1, 2].sum() < 1e-4
    # rotating by 0 is identity
    out0 = rotate_bev(
        jnp.asarray(g.reshape(1, 64, 3)), jnp.asarray([0.0]), (8, 8)
    )
    np.testing.assert_allclose(np.asarray(out0).reshape(8, 8, 3), g[0],
                               atol=1e-6)


def test_ego_motion_shift_zero_for_static_ego():
    from stereoscene_tpu.models.bevformer import ego_motion_shift

    cb = np.zeros((2, 18), np.float32)
    s = np.asarray(ego_motion_shift(jnp.asarray(cb), (8, 8), (1.0, 1.0)))
    np.testing.assert_allclose(s, 0.0, atol=1e-7)
    # pure +x translation with zero yaw: bev_angle = -atan2(0, dx) = 0
    # -> shift_y = |d| / gl / h, shift_x = 0
    cb[0, 0] = 2.0
    s = np.asarray(ego_motion_shift(jnp.asarray(cb), (8, 8), (1.0, 1.0)))
    assert s[0, 1] == pytest.approx(2.0 / 8)
    assert s[0, 0] == pytest.approx(0.0, abs=1e-6)


def test_history_bev_queue_and_can_bus():
    from stereoscene_tpu.models.bevformer_det import obtain_history_bev

    rng = np.random.RandomState(0)
    model = _tiny_det()
    feats, shapes, l2i, img_size = _tiny_inputs(rng)
    can_bus = jnp.asarray(rng.randn(1, 18).astype(np.float32))
    variables = model.init(
        jax.random.PRNGKey(0), feats, shapes, l2i, img_size, can_bus=can_bus
    )
    # can_bus params exist
    enc = variables["params"]["bev_encoder"]
    assert "can_bus_mlp1" in enc and "can_bus_norm" in enc

    featsq, shapes, l2iq, img_size = _tiny_inputs(rng, t=3)
    cbq = jnp.asarray(rng.randn(1, 3, 18).astype(np.float32))
    hist = obtain_history_bev(
        model, variables, featsq, shapes, l2iq, img_size,
        can_bus_queue=cbq, prev_bev_exists=[False, True, True],
    )
    assert hist.shape == (1, 64, 32)
    assert bool(jnp.all(jnp.isfinite(hist)))

    # full forward conditioned on the history + can_bus
    out = model.apply(
        variables, feats, shapes, l2i, img_size, prev_bev=hist,
        can_bus=can_bus,
    )
    assert out["all_cls_scores"].shape[-1] == 3
    # the temporal signal changes the prediction
    out_nohist = model.apply(variables, feats, shapes, l2i, img_size)
    assert not np.allclose(
        np.asarray(out["all_cls_scores"]),
        np.asarray(out_nohist["all_cls_scores"]),
    )


def test_prev_frame_info_semantics():
    """Scene reset + can_bus delta computation
    (ref bevformer.py:245-275 forward_test)."""
    from stereoscene_tpu.models.bevformer_det import PrevFrameInfo

    info = PrevFrameInfo(video_test_mode=True)
    cb1 = np.arange(18, dtype=np.float32)
    prev, d1 = info.step("sceneA", cb1)
    assert prev is None
    np.testing.assert_allclose(d1[:3], 0)
    assert d1[-1] == 0
    info.update("BEV1")

    cb2 = cb1 + 1.0
    prev, d2 = info.step("sceneA", cb2)
    assert prev == "BEV1"
    np.testing.assert_allclose(d2[:3], 1.0)
    assert d2[-1] == pytest.approx(1.0)

    # scene change resets history and deltas
    prev, d3 = info.step("sceneB", cb2)
    assert prev is None
    np.testing.assert_allclose(d3[:3], 0)

    # video_test_mode off never retains BEV
    info2 = PrevFrameInfo(video_test_mode=False)
    info2.step("s", cb1)
    info2.update("X")
    prev, _ = info2.step("s", cb1)
    assert prev is None
