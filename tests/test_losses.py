"""Golden-value loss tests pinning mmdet numerics (reference formulas
re-derived in numpy; cases match the weighted_loss docstring examples,
``mmdet/models/losses/utils.py:58``)."""
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
