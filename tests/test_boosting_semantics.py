"""Golden-value tests for the Boosting R-CNN-specific math: prior
extraction, norm_loss renormalisation, probabilistic score fusion, fused RPN
scores — pinned against hand-computed values from the reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
    ProbRoICfg,
    norm_loss,
    prob_fuse_scores,
    sample_rois,
)


def test_norm_loss_hand_values():
    # reference norm_loss (prob_roi_head.py:151): w' = w * sum(L)/sum(w*L);
    # out = sum(L * w') / avg
    loss = jnp.array([1.0, 2.0])
    w = jnp.array([0.5, 1.0])
    # scale = 3 / (0.5 + 2.0) = 1.2; weighted sum = 1*0.6 + 2*1.2 = 3.0
    out = float(norm_loss(loss, w, avg_factor=2.0))
    assert out == pytest.approx(1.5)


def test_norm_loss_preserves_total():
    """The renormalisation keeps the weighted sum equal to the plain sum."""
    rs = np.random.RandomState(0)
    loss = jnp.asarray(rs.rand(50).astype(np.float32) + 0.1)
    w = jnp.asarray(rs.rand(50).astype(np.float32))
    out = float(norm_loss(loss, w, avg_factor=50.0))
    assert out == pytest.approx(float(loss.mean()), rel=1e-5)


def test_prob_fusion_hand_values():
    # reference: score = sqrt(softmax(cls) * prior) (prob_roi_head.py:232-240)
    cls = jnp.array([[2.0, 0.0, 0.0]])
    prior = jnp.array([0.5])
    p = np.exp([2.0, 0, 0]) / np.exp([2.0, 0, 0]).sum()
    got = np.asarray(prob_fuse_scores(cls, prior))[0]
    np.testing.assert_allclose(got, np.sqrt(p * 0.5), rtol=1e-5)


def test_prior_extraction_cases():
    """gt-as-proposal slots -> prior 0; positives -> proposal score;
    negatives -> 1 - score (reference prob_roi_head.py:51-64)."""
    cfg = ProbRoICfg(num_samples=8, pos_fraction=0.5, pos_iou_thr=0.5,
                     neg_iou_thr=0.5, min_pos_iou=0.5)
    gt = np.array([[0, 0, 20, 20]], np.float32)
    gt_pad = np.zeros((4, 4), np.float32)
    gt_pad[0] = gt[0]
    gt_mask = np.array([True, False, False, False])
    gt_labels = np.array([2, 0, 0, 0], np.int32)
    proposals = np.array(
        [
            [0, 0, 19, 19],   # IoU ~0.9 -> positive
            [50, 50, 80, 80],  # IoU 0 -> negative
            [52, 50, 84, 80],  # negative
        ],
        np.float32,
    )
    scores = np.array([0.8, 0.3, 0.4], np.float32)
    s = sample_rois(
        cfg, jax.random.PRNGKey(0), proposals, scores,
        np.ones(3, bool), gt_pad, gt_mask, gt_labels,
    )
    boxes = np.asarray(s.boxes)
    prior = np.asarray(s.prior)
    is_pos = np.asarray(s.is_pos)
    valid = np.asarray(s.valid)
    for i in range(len(valid)):
        if not valid[i]:
            continue
        if np.allclose(boxes[i], gt[0]):
            assert prior[i] == 0.0  # gt-added
            assert is_pos[i]
        elif np.allclose(boxes[i], proposals[0]):
            assert prior[i] == pytest.approx(0.8)
            assert is_pos[i]
        elif np.allclose(boxes[i], proposals[1]):
            assert prior[i] == pytest.approx(0.7)
            assert not is_pos[i]
        elif np.allclose(boxes[i], proposals[2]):
            assert prior[i] == pytest.approx(0.6)
            assert not is_pos[i]
    # matched labels on positives
    lab = np.asarray(s.matched_label)
    assert (lab[is_pos] == 2).all()


def test_fused_rpn_score():
    """Proposal prior = sqrt(sigmoid(cls) * sigmoid(iou))
    (atss_rpn_head.py:712-731)."""
    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        ATSSRPNCfg,
        atss_rpn_proposals,
    )

    cfg = ATSSRPNCfg()
    a = 16
    anchors = np.zeros((a, 4), np.float32)
    anchors[:, 0] = np.arange(a) * 30.0
    anchors[:, 1] = 5
    anchors[:, 2] = anchors[:, 0] + 20
    anchors[:, 3] = 25
    cls = np.linspace(-2, 2, a).astype(np.float32)
    iou = np.linspace(1, -1, a).astype(np.float32)
    reg = np.zeros((a, 4), np.float32)
    boxes, sc, valid = atss_rpn_proposals(
        cfg, cls, reg, iou, anchors, [a],
        img_shape=np.array([600.0, 600.0], np.float32),
        nms_pre=16, max_per_img=16, nms_iou_thr=0.7,
    )
    sc, valid = np.asarray(sc), np.asarray(valid)
    expected = np.sqrt(
        (1 / (1 + np.exp(-cls))) * (1 / (1 + np.exp(-iou)))
    )
    got_sorted = np.sort(sc[valid])[::-1]
    np.testing.assert_allclose(
        got_sorted, np.sort(expected)[::-1], rtol=1e-5
    )


def test_dynamic_rcnn_state_update_and_sampling():
    """DynamicRCNN statistics (reference ``dynamic_roi_head.py``): the
    working IoU threshold rises toward the 75th-percentile positive IoU
    (floored at the initial value), beta falls toward the 10th-percentile
    regression error (capped at the initial value), and the traced
    threshold flows into sampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        ProbRoICfg,
        RoISample,
        dynamic_rcnn_init,
        dynamic_rcnn_update,
        sample_rois_dynamic,
    )

    r = 8
    sample = RoISample(
        boxes=jnp.zeros((r, 4)),
        is_pos=jnp.asarray([True] * 4 + [False] * 4),
        valid=jnp.ones((r,), bool),
        prior=jnp.ones((r,)),
        iou=jnp.asarray([0.9, 0.8, 0.7, 0.6] + [0.0] * 4),
        matched_gt=jnp.zeros((r, 4)),
        matched_label=jnp.zeros((r,), jnp.int32),
        gt_idx=jnp.zeros((r,), jnp.int32),
    )
    err = jnp.full((r, 4), 0.02)
    s0 = dynamic_rcnn_init()
    s1 = dynamic_rcnn_update(s0, sample, err, ema=1.0)
    # 75th percentile of [0.9, .8, .7, .6] = 0.825 > initial 0.4
    np.testing.assert_allclose(float(s1.iou_thr), 0.825, atol=1e-3)
    # 10th-percentile error 0.02 < initial beta 1.0
    np.testing.assert_allclose(float(s1.beta), 0.02, atol=1e-6)
    # floor/cap: a worthless batch cannot drag below/above the initial values
    bad = sample._replace(iou=jnp.asarray([0.1] * 4 + [0.0] * 4))
    s2 = dynamic_rcnn_update(s0, bad, jnp.full((r, 4), 9.0), ema=1.0)
    np.testing.assert_allclose(float(s2.iou_thr), 0.4, atol=1e-6)
    np.testing.assert_allclose(float(s2.beta), 1.0, atol=1e-6)

    # traced threshold changes who counts as positive
    cfg = ProbRoICfg(num_samples=8, pos_fraction=0.5, add_gt_as_proposals=False)
    props = jnp.asarray([[0.0, 0, 50, 50], [0, 0, 30, 50], [60, 60, 90, 90]])
    scores = jnp.ones((3,))
    pvalid = jnp.ones((3,), bool)
    gts = jnp.asarray([[0.0, 0, 50, 50]])
    gmask = jnp.asarray([True])
    glab = jnp.asarray([1])

    def n_pos(thr):
        s = sample_rois_dynamic(
            cfg, jax.random.PRNGKey(0), props, scores, pvalid,
            gts, gmask, glab, jnp.asarray(thr),
        )
        return int(jnp.sum(s.is_pos & s.valid))

    # prop2 has IoU 0.6 with the gt: positive at thr 0.5, not at thr 0.7
    assert n_pos(0.5) == 2
    assert n_pos(0.7) == 1
