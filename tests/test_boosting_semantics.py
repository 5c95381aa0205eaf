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
    """DynamicRCNN statistics (reference ``dynamic_roi_head.py``): the IoU
    statistic is the per-image ``iou_topk``-th largest assigner overlap
    (mean over images), the beta statistic the k-th smallest mean |dx,dy| of
    the encoded regression targets over positives (k = beta_topk*B capped at
    num_pos); the working threshold/beta move toward them with the
    reference's floor/cap, and the traced threshold flows into sampling."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        ProbRoICfg,
        dynamic_rcnn_batch_stats,
        dynamic_rcnn_init,
        dynamic_rcnn_update,
        sample_rois_dynamic,
    )

    # 2 images x 5 proposals; iou_topk=3 -> per-image 3rd-largest overlap
    overlaps = jnp.asarray(
        [[0.9, 0.8, 0.7, 0.6, 0.5], [0.95, 0.55, 0.45, 0.35, 0.99]]
    )
    pvalid = jnp.ones((2, 5), bool)
    # 6 sampled slots, 4 positives; mean|dx,dy| per slot:
    tgt = jnp.asarray(
        [
            [0.10, 0.30, 9.0, 9.0],  # pos: mean|xy| 0.20
            [0.02, 0.02, 9.0, 9.0],  # pos: 0.02
            [0.40, 0.00, 9.0, 9.0],  # pos: 0.20 -> sorted pos [0.02,0.05,0.2,0.2]
            [0.05, 0.05, 9.0, 9.0],  # pos: 0.05
            [9.0, 9.0, 9.0, 9.0],  # neg (ignored)
            [9.0, 9.0, 9.0, 9.0],  # invalid (ignored)
        ]
    )
    posv = jnp.asarray([True, True, True, True, False, False])
    biou, bbeta = dynamic_rcnn_batch_stats(
        overlaps, pvalid, tgt, posv, iou_topk=3, beta_topk=2
    )
    # per-image 3rd largest: 0.7 and 0.55 -> mean 0.625
    np.testing.assert_allclose(float(biou), 0.625, atol=1e-6)
    # k = min(beta_topk*B=4, num_pos=4) = 4 -> 4th smallest of positives = 0.2
    np.testing.assert_allclose(float(bbeta), 0.2, atol=1e-6)

    s0 = dynamic_rcnn_init(interval=1)  # boundary every step
    s1 = dynamic_rcnn_update(s0, biou, bbeta)
    np.testing.assert_allclose(float(s1.iou_thr), 0.625, atol=1e-6)
    np.testing.assert_allclose(float(s1.beta), 0.2, atol=1e-6)
    # floor/cap: a worthless batch cannot drag below/above the initial values
    s2 = dynamic_rcnn_update(s0, jnp.asarray(0.1), jnp.asarray(9.0))
    np.testing.assert_allclose(float(s2.iou_thr), 0.4, atol=1e-6)
    # no positives -> beta stat is NaN -> state unchanged
    _, nanb = dynamic_rcnn_batch_stats(
        overlaps, pvalid, tgt, jnp.zeros((6,), bool), iou_topk=3, beta_topk=2
    )
    assert bool(jnp.isnan(nanb))
    s3 = dynamic_rcnn_update(s0, jnp.asarray(jnp.nan), nanb)
    np.testing.assert_allclose(float(s3.iou_thr), float(s0.iou_thr), atol=1e-6)
    np.testing.assert_allclose(float(s2.beta), 1.0, atol=1e-6)

    # interval replay is EXACT (reference update_hyperparameters: mean of
    # the IoU history, median of the beta history, applied only on the
    # update_iter_interval boundary; history then restarts)
    ious = [0.55, 0.72, 0.61, 0.80, 0.66, 0.58, 0.77, 0.62]
    betas = [0.30, 0.10, 0.25, 0.05, 0.40, 0.15, 0.20, 0.35]
    s = dynamic_rcnn_init(initial_iou=0.4, initial_beta=1.0, interval=4)
    for i in range(8):
        prev_iou = float(s.iou_thr)
        s = dynamic_rcnn_update(s, jnp.asarray(ious[i]), jnp.asarray(betas[i]))
        if (i + 1) % 4 != 0:  # mid-interval: working values untouched
            np.testing.assert_allclose(float(s.iou_thr), prev_iou, atol=1e-7)
        else:
            window = slice(i - 3, i + 1)
            np.testing.assert_allclose(
                float(s.iou_thr),
                max(0.4, np.mean(ious[window])), atol=1e-6)
            np.testing.assert_allclose(
                float(s.beta),
                min(1.0, np.median(betas[window])), atol=1e-6)

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


def test_boost_roi_head_multiclass_prior():
    """BoostRoIHead (reference ``prob_roi_head.py:286-334``): priors come
    from the proposals' per-class score columns — positives take the score
    at the matched gt label, negatives the max over classes, gt-added
    proposals 0; at test an all-ones bg column is appended before the
    sqrt fusion."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        ProbRoICfg,
        boost_fuse_scores,
        sample_rois_boost,
    )

    # 1 gt + 2 proposals: prop0 overlaps the gt (pos), prop1 is far (neg).
    cfg = ProbRoICfg(
        num_samples=4, pos_fraction=0.5, add_gt_as_proposals=True,
        pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
    )
    props = jnp.asarray(
        [[0.0, 0, 48, 50], [60, 60, 90, 90], [62, 60, 92, 90]]
    )
    cls_scores = jnp.asarray(
        [[0.7, 0.2, 0.1], [0.3, 0.8, 0.4], [0.3, 0.5, 0.8]]
    )  # (P, C=3)
    pvalid = jnp.ones((3,), bool)
    gts = jnp.asarray([[0.0, 0, 50, 50]])
    gmask = jnp.asarray([True])
    glab = jnp.asarray([0])

    s = sample_rois_boost(
        cfg, jax.random.PRNGKey(0), props, cls_scores, pvalid,
        gts, gmask, glab,
    )
    prior = np.asarray(s.prior)
    for i in range(cfg.num_samples):
        if not bool(s.valid[i]):
            assert prior[i] == 0.0
        elif bool(s.is_gt[i]):
            assert prior[i] == 0.0  # gt-added -> zero prior
        elif bool(s.is_pos[i]):
            # positive matched to gt label 0 -> prop0's class-0 score
            np.testing.assert_allclose(prior[i], 0.7, atol=1e-6)
        else:
            # negative -> max over that proposal's class scores (0.8 for
            # both negative proposals here)
            np.testing.assert_allclose(prior[i], 0.8, atol=1e-6)
    # all three candidate roles must appear with these shapes
    assert bool(jnp.any(s.is_gt & s.valid))
    assert bool(jnp.any(s.is_pos & ~s.is_gt & s.valid))
    assert bool(jnp.any(~s.is_pos & s.valid))

    # test fusion: ones bg column
    logits = jnp.asarray([[2.0, 0.0, -1.0, 0.5]])  # (R=1, C+1=4)
    pri = jnp.asarray([[0.25, 1.0, 0.0]])
    fused = np.asarray(boost_fuse_scores(logits, pri))
    sm = np.asarray(jax.nn.softmax(logits, axis=-1))
    np.testing.assert_allclose(
        fused, np.sqrt(sm * np.asarray([[0.25, 1.0, 0.0, 1.0]])), atol=1e-6
    )
