"""Tests for masked MaxIoU assignment and fixed-size sampling."""
import jax
import numpy as np

from boosting_rcnn_tpu.ops import assigners, samplers


def pad_gt(gt, g_max=8):
    out = np.zeros((g_max, 4), np.float32)
    mask = np.zeros((g_max,), bool)
    out[: len(gt)] = gt
    mask[: len(gt)] = True
    return out, mask


def test_max_iou_assign_reference_example():
    # Mirrors the reference docstring example (max_iou_assigner.py:87-94):
    # two boxes, one gt overlapping box0 at IoU 0.9 -> box0 pos (low-quality
    # match), box1 neg.
    boxes = np.array([[0, 0, 10, 10], [10, 10, 20, 20]], np.float32)
    gt, mask = pad_gt(np.array([[0, 0, 10, 9]], np.float32))
    res = assigners.max_iou_assign(
        boxes, np.ones(2, bool), gt, mask, pos_iou_thr=0.5, neg_iou_thr=0.5
    )
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [1, 0])


def test_assign_thresholds_and_low_quality():
    boxes = np.array(
        [
            [0, 0, 10, 10],  # iou 1.0 with gt0 -> pos
            [0, 0, 10, 6],  # iou 0.6 -> pos
            [0, 0, 10, 4],  # iou 0.4 -> neg (below 0.5)
            [30, 30, 40, 40],  # iou 0 -> neg
            [19, 0, 29, 10],  # best match of gt1 at low iou -> forced pos
        ],
        np.float32,
    )
    gt, mask = pad_gt(
        np.array([[0, 0, 10, 10], [20, 0, 30, 10]], np.float32)
    )
    res = assigners.max_iou_assign(
        boxes,
        np.ones(5, bool),
        gt,
        mask,
        pos_iou_thr=0.5,
        neg_iou_thr=0.5,
        min_pos_iou=0.3,
        match_low_quality=True,
        gt_labels=np.array([3, 1, 0, 0, 0, 0, 0, 0], np.int32),
    )
    gi = np.asarray(res.gt_inds)
    assert gi[0] == 1 and gi[1] == 1
    assert gi[2] == 0 and gi[3] == 0
    assert gi[4] == 2  # low-quality forced match to gt1 (iou ~0.47 >= 0.3)
    labels = np.asarray(res.labels)
    assert labels[0] == 3 and labels[4] == 1 and labels[2] == -1


def test_assign_no_gt_all_background():
    boxes = np.random.RandomState(0).rand(10, 4).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 1
    gt, mask = pad_gt(np.zeros((0, 4), np.float32))
    res = assigners.max_iou_assign(boxes, np.ones(10, bool), gt, mask)
    assert (np.asarray(res.gt_inds) == 0).all()


def test_assign_invalid_boxes_ignored():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    gt, mask = pad_gt(np.array([[0, 0, 10, 10]], np.float32))
    valid = np.array([True, False])
    res = assigners.max_iou_assign(boxes, valid, gt, mask)
    gi = np.asarray(res.gt_inds)
    assert gi[0] == 1 and gi[1] == -1


def test_random_sampler_counts_and_layout(rng):
    n = 200
    gt_inds = np.zeros(n, np.int32)
    gt_inds[:30] = rng.randint(1, 4, 30)  # 30 positives
    assign = assigners.AssignResult(
        gt_inds, np.zeros(n, np.float32), np.full(n, -1, np.int32)
    )
    res = samplers.random_sample(
        jax.random.PRNGKey(0), assign, np.ones(n, bool), num=64, pos_fraction=0.25
    )
    is_pos, valid = np.asarray(res.is_pos), np.asarray(res.valid)
    assert valid.sum() == 64
    assert is_pos.sum() == 16  # min(30, 64*0.25)
    # layout: positives occupy the first slots
    assert is_pos[:16].all() and not is_pos[16:].any()
    # sampled indices actually point at positives/negatives
    inds = np.asarray(res.inds)
    assert (gt_inds[inds[:16]] > 0).all()
    assert (gt_inds[inds[16:64]] == 0).all()
    # no duplicates among valid slots
    assert len(np.unique(inds[:64])) == 64


def test_random_sampler_few_positives():
    n = 100
    gt_inds = np.zeros(n, np.int32)
    gt_inds[:3] = 1  # only 3 positives, want 16
    assign = assigners.AssignResult(
        gt_inds, np.zeros(n, np.float32), np.full(n, -1, np.int32)
    )
    res = samplers.random_sample(
        jax.random.PRNGKey(1), assign, np.ones(n, bool), num=64, pos_fraction=0.25
    )
    assert np.asarray(res.is_pos).sum() == 3
    assert np.asarray(res.valid).sum() == 64  # backfilled with negatives


def test_random_sampler_distribution():
    # Each negative should be picked ~uniformly across seeds.
    n = 40
    gt_inds = np.zeros(n, np.int32)
    assign = assigners.AssignResult(
        gt_inds, np.zeros(n, np.float32), np.full(n, -1, np.int32)
    )
    counts = np.zeros(n)
    trials = 200
    sample = jax.jit(
        lambda k: samplers.random_sample(k, assign, np.ones(n, bool), num=10)
    )
    for s in range(trials):
        res = sample(jax.random.PRNGKey(s))
        counts[np.asarray(res.inds)[np.asarray(res.valid)]] += 1
    freq = counts / trials
    assert abs(freq.mean() - 0.25) < 0.02  # 10/40
    assert freq.std() < 0.08


def test_pseudo_sampler():
    gt_inds = np.array([-1, 0, 2, 1], np.int32)
    assign = assigners.AssignResult(
        gt_inds, np.zeros(4, np.float32), np.full(4, -1, np.int32)
    )
    res = samplers.pseudo_sample(assign, np.ones(4, bool))
    np.testing.assert_array_equal(np.asarray(res.is_pos), [False, False, True, True])
    np.testing.assert_array_equal(np.asarray(res.valid), [False, True, True, True])
    np.testing.assert_array_equal(np.asarray(res.gt_inds), [0, 0, 1, 0])
