"""Golden-value loss tests pinning mmdet numerics (reference formulas
re-derived in numpy; cases match the weighted_loss docstring examples,
``mmdet/models/losses/utils.py:58``)."""
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.ops import losses as L


def test_weight_reduce_protocol():
    # the reference's weighted_loss docstring example values
    pred = np.array([0.0, 2.0, 3.0], np.float32)
    target = np.array([1.0, 1.0, 1.0], np.float32)
    weight = np.array([1.0, 0.0, 1.0], np.float32)
    assert float(L.l1_loss(pred, target)) == pytest.approx(1.3333, abs=1e-3)
    assert float(L.l1_loss(pred, target, weight)) == pytest.approx(1.0)
    np.testing.assert_allclose(
        np.asarray(L.l1_loss(pred, target, reduction="none")), [1, 1, 2]
    )
    assert float(L.l1_loss(pred, target, weight, avg_factor=2)) == pytest.approx(1.5)


def np_focal(pred, target, gamma=2.0, alpha=0.25):
    p = 1 / (1 + np.exp(-pred))
    pt = (1 - p) * target + p * (1 - target)
    fw = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    bce = np.maximum(pred, 0) - pred * target + np.log1p(np.exp(-np.abs(pred)))
    return bce * fw


def test_sigmoid_focal_matches_spec(rng):
    pred = rng.randn(12, 3).astype(np.float32) * 3
    target = (rng.rand(12, 3) > 0.7).astype(np.float32)
    got = np.asarray(L.sigmoid_focal_loss(pred, target, reduction="none"))
    np.testing.assert_allclose(got, np_focal(pred, target), rtol=1e-5, atol=1e-6)
    # (N,) weight broadcasts over classes
    w = rng.rand(12).astype(np.float32)
    got_m = float(L.sigmoid_focal_loss(pred, target, weight=w, avg_factor=5.0))
    exp = (np_focal(pred, target) * w[:, None]).sum() / 5.0
    assert got_m == pytest.approx(exp, rel=1e-5)


def test_cross_entropy_matches_numpy(rng):
    pred = rng.randn(10, 5).astype(np.float32)
    label = rng.randint(0, 5, 10)
    got = np.asarray(L.cross_entropy_loss(pred, label, reduction="none"))
    e = np.exp(pred - pred.max(-1, keepdims=True))
    sm = e / e.sum(-1, keepdims=True)
    exp = -np.log(sm[np.arange(10), label])
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_iou_loss_values():
    pred = np.array([[0, 0, 10, 10]], np.float32)
    target = np.array([[0, 0, 10, 10]], np.float32)
    assert float(L.iou_loss(pred, target)) == pytest.approx(0.0, abs=1e-5)
    target2 = np.array([[0, 0, 10, 5]], np.float32)
    # iou = 0.5 -> -log(0.5)
    assert float(L.iou_loss(pred, target2)) == pytest.approx(np.log(2.0), abs=1e-5)
    assert float(L.giou_loss(pred, target2)) == pytest.approx(0.5, abs=1e-5)


def test_ciou_perfect_box_zero():
    pred = np.array([[5, 5, 20, 30]], np.float32)
    assert float(L.ciou_loss(pred, pred)) == pytest.approx(0.0, abs=1e-4)


def test_smooth_l1_beta():
    pred = np.array([0.0, 2.0], np.float32)
    target = np.array([0.5, 0.0], np.float32)
    got = np.asarray(L.smooth_l1_loss(pred, target, beta=1.0, reduction="none"))
    np.testing.assert_allclose(got, [0.125, 1.5], atol=1e-6)


def test_bce_matches_numpy(rng):
    logits = rng.randn(20).astype(np.float32) * 4
    target = rng.rand(20).astype(np.float32)
    got = np.asarray(L.binary_cross_entropy_loss(logits, target, reduction="none"))
    p = 1 / (1 + np.exp(-logits))
    exp = -(target * np.log(p + 1e-12) + (1 - target) * np.log(1 - p + 1e-12))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_varifocal_negative_weighting(rng):
    pred = rng.randn(6, 4).astype(np.float32)
    target = np.zeros((6, 4), np.float32)
    target[0, 1] = 0.8  # one positive with iou 0.8
    got = np.asarray(L.varifocal_loss(pred, target, reduction="none"))
    p = 1 / (1 + np.exp(-pred))
    bce = np.maximum(pred, 0) - pred * target + np.log1p(np.exp(-np.abs(pred)))
    fw = target * (target > 0) + 0.75 * np.abs(p - target) ** 2 * (target <= 0)
    np.testing.assert_allclose(got, bce * fw, rtol=1e-4, atol=1e-5)


def test_quality_focal(rng):
    pred = rng.randn(5, 3).astype(np.float32)
    labels = np.array([0, 2, 3, 1, 3])  # 3 == bg
    quality = np.array([0.9, 0.5, 0.0, 0.7, 0.0], np.float32)
    got = np.asarray(
        L.quality_focal_loss(pred, labels, quality, reduction="none")
    )
    assert got.shape == (5,)
    assert np.isfinite(got).all()


def test_eiou_and_focal_eiou_vs_reference_formula():
    """Fork-added EIoU/Focal-EIoU (reference iou_loss.py:240-344): checked
    against a direct numpy transcription of the reference math."""
    import numpy as np
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.losses import eiou_loss, focal_eiou_loss

    rs = np.random.RandomState(0)
    x1y1 = rs.rand(16, 2) * 50
    wh = rs.rand(16, 2) * 60 + 2
    pred = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    t1 = rs.rand(16, 2) * 50
    t2 = rs.rand(16, 2) * 60 + 2
    target = np.concatenate([t1, t1 + t2], -1).astype(np.float32)
    eps = 1e-7

    lt = np.maximum(pred[:, :2], target[:, :2])
    rb = np.minimum(pred[:, 2:], target[:, 2:])
    whc = np.clip(rb - lt, 0, None)
    overlap = whc[:, 0] * whc[:, 1]
    ap = (pred[:, 2] - pred[:, 0]) * (pred[:, 3] - pred[:, 1])
    ag = (target[:, 2] - target[:, 0]) * (target[:, 3] - target[:, 1])
    ious = overlap / (ap + ag - overlap + eps)
    cw = np.maximum(pred[:, 2], target[:, 2]) - np.minimum(pred[:, 0], target[:, 0]) + eps
    ch = np.maximum(pred[:, 3], target[:, 3]) - np.minimum(pred[:, 1], target[:, 1]) + eps
    c2 = cw**2 + ch**2 + eps
    rho2 = (((target[:, 0] + target[:, 2]) - (pred[:, 0] + pred[:, 2])) ** 2
            + ((target[:, 1] + target[:, 3]) - (pred[:, 1] + pred[:, 3])) ** 2) / 4
    w1, h1 = pred[:, 2] - pred[:, 0], pred[:, 3] - pred[:, 1]
    w2, h2 = target[:, 2] - target[:, 0], target[:, 3] - target[:, 1]
    rhow = (np.abs(w2 - w1) + eps) ** 2
    rhoh = (np.abs(h2 - h1) + eps) ** 2
    want = 1 - ious + rho2 / c2 + rhow / cw**2 + rhoh / ch**2

    got = np.asarray(eiou_loss(jnp.asarray(pred), jnp.asarray(target),
                               reduction="none"))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    got_f = np.asarray(focal_eiou_loss(jnp.asarray(pred), jnp.asarray(target),
                                       gamma=0.5, reduction="none"))
    np.testing.assert_allclose(got_f, want * ious**0.5, rtol=1e-5)
    # perfect prediction -> ~0 loss
    z = np.asarray(eiou_loss(jnp.asarray(pred), jnp.asarray(pred),
                             reduction="none"))
    assert (np.abs(z) < 1e-4).all()


def test_dice_and_kd_losses_golden():
    """Dice vs torch formula; KD-KL vs hand torch computation."""
    import numpy as np
    import torch
    import torch.nn.functional as F

    from boosting_rcnn_tpu.ops.losses import dice_loss, kd_kl_div_loss

    rng = np.random.RandomState(0)
    p = rng.randn(3, 16).astype(np.float32)
    t = (rng.rand(3, 16) > 0.5).astype(np.float32)
    got = np.asarray(dice_loss(jnp.asarray(p), jnp.asarray(t)))
    tp = torch.sigmoid(torch.from_numpy(p))
    tt = torch.from_numpy(t)
    a = (tp * tt).sum(1)
    want = 1 - 2 * a / ((tp * tp).sum(1) + 1e-3 + (tt * tt).sum(1) + 1e-3)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)

    logits = rng.randn(4, 5).astype(np.float32)
    soft = rng.randn(4, 5).astype(np.float32)
    got = np.asarray(kd_kl_div_loss(jnp.asarray(logits), jnp.asarray(soft),
                                    T=2.0))
    want = F.kl_div(
        F.log_softmax(torch.from_numpy(logits) / 2.0, dim=1),
        F.softmax(torch.from_numpy(soft) / 2.0, dim=1),
        reduction="none",
    ).mean(1) * 4.0
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_bucketing_coder_roundtrip():
    """SABL coder (reference bucketing_bbox_coder.py): encoding a GT then
    decoding with the one-hot labels + exact offsets recovers the GT."""
    import numpy as np

    from boosting_rcnn_tpu.ops.bucketing_coder import bbox2bucket, bucket2bbox

    rng = np.random.RandomState(0)
    props = jnp.asarray([[10.0, 10.0, 90.0, 70.0], [0.0, 0.0, 50.0, 40.0]])
    gts = jnp.asarray([[14.0, 12.0, 85.0, 66.0], [5.0, 3.0, 44.0, 39.0]])
    offsets, ow, labels, cw = bbox2bucket(props, gts, num_buckets=14,
                                          scale_factor=1.7)
    assert offsets.shape == (2, 28) and labels.shape == (2, 28)
    # perfect predictions: use labels as cls logits and the encoded offsets
    side = 7
    n = 2
    # select per-side offset at the labelled bucket
    off_sel = (offsets.reshape(n, 4, side)
               * labels.reshape(n, 4, side)).sum(-1, keepdims=True)
    off_pred = jnp.broadcast_to(off_sel, (n, 4, side)).reshape(n, 28)
    boxes, conf = bucket2bbox(props, labels * 100.0, off_pred,
                              num_buckets=14, scale_factor=1.7)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(gts), atol=1e-3)
    assert np.all(np.asarray(conf) > 0.9)


def test_isr_p_and_carl():
    """ISR-P: higher-IoU positives get larger weights; total positive cls
    loss is preserved (reference isr_p renormalisation). CARL: weights rise
    with cls confidence."""
    import numpy as np

    from boosting_rcnn_tpu.ops.pisa import carl_loss, isr_p_weights

    labels = jnp.asarray([0, 0, 0, 1, 9])
    gts = jnp.asarray([0, 0, 1, 2, 0])
    ious = jnp.asarray([0.9, 0.6, 0.7, 0.8, 0.0])
    lw = jnp.ones(5)
    pos = jnp.asarray([True, True, True, True, False])
    ce = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    w = np.asarray(isr_p_weights(labels, gts, ious, lw, pos, ce))
    assert w[0] > w[1]  # same (label, gt): higher IoU ranks first
    np.testing.assert_allclose((w * np.asarray(ce))[:4].sum(), 4.0,
                               rtol=1e-5)
    assert w[4] == 1.0  # negatives untouched

    cls = jnp.asarray([[5.0, 0.0], [0.0, 0.0], [0.0, 5.0]])
    reg = jnp.ones((3, 4))
    loss_hi = carl_loss(cls, jnp.asarray([0, 0, 0]),
                        jnp.asarray([True, True, False]), reg)
    assert np.isfinite(float(loss_hi)) and float(loss_hi) > 0


def test_pisa_retina_loss_wiring():
    """PISA (reference pisa_retinanet_head.py): the pisa flag adds a carl
    term and reweights positives without breaking finiteness."""
    import jax

    from boosting_rcnn_tpu.models.dense_heads.retina_head import (
        RetinaCfg,
        retina_loss,
    )

    rng = np.random.RandomState(0)
    a, c = 32, 4
    anchors = jnp.asarray(
        np.stack([rng.uniform(0, 80, a), rng.uniform(0, 60, a),
                  rng.uniform(80, 160, a), rng.uniform(60, 120, a)], -1),
        jnp.float32)
    cls = jnp.asarray(rng.randn(1, a, c).astype(np.float32))
    reg = jnp.asarray(rng.randn(1, a, 4).astype(np.float32) * 0.1)
    gts = jnp.asarray([[[10.0, 10.0, 90.0, 70.0], [0, 0, 0, 0]]])
    gls = jnp.asarray([[2, 0]])
    gm = jnp.asarray([[True, False]])
    valid = jnp.ones((1, a), bool)
    base = retina_loss(RetinaCfg(num_classes=c), cls, reg, anchors, valid,
                       gts, gls, gm)
    pisa = retina_loss(RetinaCfg(num_classes=c, pisa=True), cls, reg,
                       anchors, valid, gts, gls, gm)
    assert "loss_carl" in pisa and "loss_carl" not in base
    for v in pisa.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_ld_distillation_term():
    """LD (reference ld_head.py): with a teacher, gfl_loss gains a KL term
    that is zero when student == teacher and positive otherwise."""
    import jax

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    mc = dict(
        type="LD",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                  out_channels=32, start_level=1,
                  add_extra_convs="on_output", num_outs=5),
        bbox_head=dict(
            type="LDHead", num_classes=4, in_channels=32,
            feat_channels=32, stacked_convs=1, reg_max=8,
            loss_ld=dict(type="LocalizationDistillationLoss",
                         loss_weight=0.25, T=2),
            anchor_generator=dict(
                type="AnchorGenerator", ratios=[1.0], octave_base_scale=8,
                scales_per_octave=1, strides=[8, 16, 32, 64, 128])),
        teacher_config=dict(
            backbone=dict(type="ResNet", depth=18, base_channels=8,
                          frozen_stages=-1),
            neck=dict(type="FPN", in_channels=[8, 16, 32, 64],
                      out_channels=32, start_level=1,
                      add_extra_convs="on_output", num_outs=5),
            bbox_head=dict(
                type="GFLHead", num_classes=4, in_channels=32,
                feat_channels=32, stacked_convs=1, reg_max=8,
                anchor_generator=dict(
                    type="AnchorGenerator", ratios=[1.0],
                    octave_base_scale=8, scales_per_octave=1,
                    strides=[8, 16, 32, 64, 128]))),
    )
    det = build_detector(mc)
    assert det.teacher is not None
    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    tvars = det.teacher.init(jax.random.PRNGKey(7), canvas)
    pack, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    # teacher == student -> KL exactly 0
    det.set_teacher_variables(variables)
    l_same = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nla)
    assert "loss_ld" in l_same
    np.testing.assert_allclose(float(l_same["loss_ld"]), 0.0, atol=1e-5)

    det.set_teacher_variables(tvars)
    l_diff = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nla)
    assert float(l_diff["loss_ld"]) > 0
    for k, v in l_diff.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_pisa_ssd_loss_wiring():
    """PISA-SSD (reference pisa_ssd_head.py): pisa flag adds carl + keeps
    losses finite with the OHEM CE."""
    import jax

    from boosting_rcnn_tpu.models.dense_heads.ssd_head import SSDCfg, ssd_loss

    rng = np.random.RandomState(0)
    a, c = 24, 4
    anchors = jnp.asarray(
        np.stack([rng.uniform(0, 60, a), rng.uniform(0, 40, a),
                  rng.uniform(60, 120, a), rng.uniform(40, 90, a)], -1),
        jnp.float32)
    cls = jnp.asarray(rng.randn(1, a, c + 1).astype(np.float32))
    reg = jnp.asarray(rng.randn(1, a, 4).astype(np.float32) * 0.1)
    gts = jnp.asarray([[[10.0, 10.0, 70.0, 50.0], [0, 0, 0, 0]]])
    gls = jnp.asarray([[1, 0]])
    gm = jnp.asarray([[True, False]])
    valid = jnp.ones((1, a), bool)
    out = ssd_loss(SSDCfg(num_classes=c, pisa=True), cls, reg, anchors,
                   valid, gts, gls, gm)
    assert "loss_carl" in out
    for v in out.values():
        assert np.isfinite(float(v))
