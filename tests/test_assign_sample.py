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


def test_sim_ota_matches_reference_algorithm(rng):
    """Fixed-shape SimOTA == the reference's sequential dynamic-k algorithm
    (``sim_ota_assigner.py:125-255``) re-implemented in numpy."""
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.dense_heads.yolox_head import (
        YOLOXCfg,
        sim_ota_assign,
    )
    from tests.test_box_ops import np_iou

    cfg = YOLOXCfg(num_classes=3)
    n, g, c = 120, 4, 3
    priors = np.zeros((n, 4), np.float32)
    priors[:, 0] = (np.arange(n) % 12) * 8
    priors[:, 1] = (np.arange(n) // 12) * 8
    priors[:, 2:] = 8
    decoded = rng.rand(n, 4).astype(np.float32) * 60
    decoded[:, 2:] = decoded[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 30
    gts = np.array(
        [[4, 4, 40, 48], [30, 20, 90, 70], [0, 0, 96, 80], [0, 0, 0, 0]],
        np.float32,
    )
    labels = np.array([0, 2, 1, 0])
    mask = np.array([True, True, True, False])
    scores = rng.rand(n, c).astype(np.float32) * 0.9 + 0.05

    # --- numpy reference ---
    cx = priors[:, 0] + 4
    cy = priors[:, 1] + 4
    in_gt = np.stack(
        [(cx > b[0]) & (cy > b[1]) & (cx < b[2]) & (cy < b[3]) for b in gts], 1
    )
    gcx, gcy = (gts[:, 0] + gts[:, 2]) / 2, (gts[:, 1] + gts[:, 3]) / 2
    rr = 2.5 * 8
    in_ct = np.stack(
        [
            (cx > gcx[j] - rr) & (cy > gcy[j] - rr)
            & (cx < gcx[j] + rr) & (cy < gcy[j] + rr)
            for j in range(g)
        ],
        1,
    )
    in_gt &= mask[None]
    in_ct &= mask[None]
    cand = in_gt & in_ct
    ious = np_iou(decoded, gts)
    iou_cost = -np.log(ious + 1e-7)
    p = np.sqrt(scores)
    cls_cost = np.zeros((n, g), np.float32)
    for j in range(g):
        onehot = np.eye(c)[labels[j]]
        bce = -(onehot * np.log(p) + (1 - onehot) * np.log(1 - p)).sum(-1)
        cls_cost[:, j] = bce
    cost = cls_cost + 3.0 * iou_cost + 1e8 * (~cand)
    matching = np.zeros((n, g))
    for j in range(g):
        if not mask[j]:
            continue
        cand_ious = np.where(cand[:, j] | in_gt[:, j] | in_ct[:, j], ious[:, j], 0)
        k = int(np.clip(np.sort(cand_ious)[-10:].sum(), 1, 10))
        order = np.argsort(cost[:, j], kind="stable")[:k]
        order = order[cost[order, j] < 1e8 / 2]  # finite-cost picks only
        matching[order, j] = 1
    multi = matching.sum(1) > 1
    for i in np.where(multi)[0]:
        best = np.argmin(cost[i])
        matching[i] = 0
        matching[i, best] = 1
    exp_pos = matching.sum(1) > 0
    exp_g = matching.argmax(1)

    pos, best_g, matched_iou = jax.jit(
        lambda s, d: sim_ota_assign(cfg, s, jnp.asarray(priors), d,
                                    jnp.asarray(gts), jnp.asarray(labels),
                                    jnp.asarray(mask))
    )(scores, decoded)
    np.testing.assert_array_equal(np.asarray(pos), exp_pos)
    np.testing.assert_array_equal(np.asarray(best_g)[exp_pos], exp_g[exp_pos])
    np.testing.assert_allclose(
        np.asarray(matched_iou)[exp_pos],
        ious[np.arange(n), exp_g][exp_pos], rtol=1e-5,
    )


def test_instance_balanced_sampler_spreads_instances():
    """InstanceBalancedPosSampler: with more positives than slots, every
    instance contributes before any instance gets a second slot."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.assigners import AssignResult
    from boosting_rcnn_tpu.ops.samplers import instance_balanced_sample

    # inst 1 has 8 candidates, inst 2 has 2; 4 pos slots
    gt_inds = jnp.asarray([1] * 8 + [2] * 2 + [0] * 10, jnp.int32)
    assign = AssignResult(gt_inds, jnp.zeros(20), jnp.zeros(20, jnp.int32))
    s = instance_balanced_sample(
        jax.random.PRNGKey(0), assign, jnp.ones(20, bool),
        num=8, pos_fraction=0.5, max_gt=4,
    )
    picked_inst = np.asarray(s.gt_inds)[np.asarray(s.is_pos)]
    # both instances represented, neither exceeds 1 + ceil
    assert set(picked_inst.tolist()) == {0, 1}
    assert (picked_inst == 1).sum() == 2  # inst 2 only has 2 candidates


def test_iou_balanced_neg_sampler_covers_bins():
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.assigners import AssignResult
    from boosting_rcnn_tpu.ops.samplers import iou_balanced_neg_sample

    n = 30
    ious = np.concatenate([
        np.full(10, 0.05), np.full(10, 0.2), np.full(10, 0.4),
    ]).astype(np.float32)
    assign = AssignResult(
        jnp.zeros(n, jnp.int32), jnp.asarray(ious), jnp.zeros(n, jnp.int32)
    )
    s = iou_balanced_neg_sample(
        jax.random.PRNGKey(0), assign, jnp.ones(n, bool),
        num=6, pos_fraction=0.25, num_bins=3, ceil_thr=0.5,
    )
    sel = np.asarray(s.inds)[np.asarray(s.valid) & ~np.asarray(s.is_pos)]
    bins = np.digitize(ious[sel], [0.5 / 3, 1.0 / 3])
    # all three IoU bins represented (round-robin draw)
    assert set(bins.tolist()) == {0, 1, 2}


def test_score_hlr_sampler_prefers_hard_negatives():
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.assigners import AssignResult
    from boosting_rcnn_tpu.ops.samplers import score_hlr_sample

    n = 20
    scores = np.zeros(n, np.float32)
    scores[:4] = [0.9, 0.8, 0.7, 0.6]  # hard negatives
    assign = AssignResult(
        jnp.zeros(n, jnp.int32), jnp.zeros(n), jnp.zeros(n, jnp.int32)
    )
    s = score_hlr_sample(
        jax.random.PRNGKey(0), assign, jnp.ones(n, bool),
        jnp.asarray(scores), num=8, pos_fraction=0.25, score_fraction=0.5,
    )
    sel = set(np.asarray(s.inds)[np.asarray(s.valid)].tolist())
    # the 4 hardest negatives are all selected (score_fraction 0.5 of 8)
    assert {0, 1, 2, 3} <= sel


def test_grid_assign_responsible_gate():
    """GridAssigner (reference grid_assigner.py): positives require the
    responsible-cell flag; unflagged high-IoU boxes stay ignored."""
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.assigners import grid_assign

    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    res = grid_assign(
        boxes, jnp.asarray([True, False, True]),
        jnp.asarray([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]]),
        jnp.asarray([True, True]), jnp.asarray([3, 7]), pos_iou_thr=0.5)
    assert int(res.gt_inds[0]) == 1
    assert int(res.gt_inds[1]) == -1  # not responsible
    assert int(res.gt_inds[2]) == 2
    assert int(res.labels[2]) == 7


def test_region_assign_center_levels():
    """RegionAssigner (reference region_assigner.py): gts claim center-
    region anchors at their scale level; ignore ring marks -1."""
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.assigners import region_assign

    # two levels, anchor centers at (5,5), (6,6) on lvl0 and (55,55) on lvl1
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32)
    res = region_assign(
        anchors, [2, 1], (8, 16), 4.0,
        jnp.asarray([[0.0, 0.0, 12.0, 12.0]]), jnp.asarray([True]))
    # gt scale 12 -> level 0; centers (5,5)/(6,6) are in its center region
    assert int(res.gt_inds[0]) == 1 and int(res.gt_inds[1]) == 1
    assert int(res.gt_inds[2]) <= 0


def test_nms_match_groups():
    """mmcv nms_match: boxes cluster to their greedy keeper."""
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.nms import nms_match

    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60], [0, 0, 9, 9]],
        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    g = np.asarray(nms_match(boxes, scores, 0.5))
    assert list(g) == [0, 0, 2, 0]
    g2 = np.asarray(nms_match(boxes, scores, 0.5,
                              valid=jnp.asarray([True, True, True, False])))
    assert g2[3] == -1
