"""Validation of the numpy COCO-style evaluator on constructed cases with
known AP (the reference validates via pycocotools; absent here, we pin
known-answer scenarios)."""
import numpy as np

from boosting_rcnn_tpu.core.evaluation.coco_eval import CocoStyleEval


def mk_gt(boxes, labels):
    return dict(
        bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
        labels=np.asarray(labels, np.int64),
        bboxes_ignore=np.zeros((0, 4), np.float32),
    )


def mk_res(dets, labels):
    return (
        np.asarray(dets, np.float32).reshape(-1, 5),
        np.asarray(labels, np.int64),
    )


def test_perfect_detection_ap1():
    gts = [mk_gt([[10, 10, 60, 60]], [0])]
    results = [mk_res([[10, 10, 60, 60, 0.9]], [0])]
    ev = CocoStyleEval(gts, results, num_classes=1)
    s = ev.summarize()
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0


def test_miss_gives_zero():
    gts = [mk_gt([[10, 10, 60, 60]], [0])]
    results = [mk_res(np.zeros((0, 5)), np.zeros(0))]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    assert s["AP"] == 0.0


def test_wrong_class_zero():
    gts = [mk_gt([[10, 10, 60, 60]], [0])]
    results = [mk_res([[10, 10, 60, 60, 0.9]], [1])]
    s = CocoStyleEval(gts, results, num_classes=2).summarize()
    assert s["AP"] == 0.0


def test_half_iou_passes_only_low_thresholds():
    # det IoU with gt = 50/150 ≈ 0.333 -> below every threshold: AP 0
    gts = [mk_gt([[0, 0, 10, 10]], [0])]
    results = [mk_res([[0, 5, 10, 15, 0.9]], [0])]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    assert s["AP"] == 0.0
    # IoU ≈ 0.6 (shift by 2.5): passes 0.5/0.55/0.6, fails higher
    gts = [mk_gt([[0, 0, 10, 10]], [0])]
    results = [mk_res([[0, 2.5, 10, 12.5, 0.9]], [0])]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    assert s["AP50"] == 1.0
    assert s["AP75"] == 0.0
    assert 0.2 < s["AP"] < 0.4  # 3/10 thresholds pass


def test_duplicate_detection_is_fp():
    # one gt, two identical dets: 2nd is a FP; P@thresholds:
    # precision envelope -> AP stays 1.0 at recall 1 reached by first det
    gts = [mk_gt([[0, 0, 10, 10]], [0])]
    results = [mk_res([[0, 0, 10, 10, 0.9], [0, 0, 10, 10, 0.8]], [0, 0])]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    assert s["AP50"] == 1.0


def test_score_ordering_matters():
    # two gts; high-scored FP then lower-scored TPs: precision at
    # recall points is reduced
    gts = [mk_gt([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 0])]
    results = [
        mk_res(
            [
                [50, 50, 60, 60, 0.95],  # FP, highest score
                [0, 0, 10, 10, 0.9],
                [20, 20, 30, 30, 0.8],
            ],
            [0, 0, 0],
        )
    ]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    # precision after all 3: [0, 1/2, 2/3] -> envelope [2/3, 2/3, 2/3]
    assert abs(s["AP50"] - 2 / 3) < 0.01


def test_crowd_ignore_not_fp():
    gt = mk_gt([[0, 0, 10, 10]], [0])
    gt["bboxes_ignore"] = np.array([[100, 100, 150, 150]], np.float32)
    results = [
        mk_res(
            [[0, 0, 10, 10, 0.9], [100, 100, 150, 150, 0.85]], [0, 0]
        )
    ]
    s = CocoStyleEval([gt], results, num_classes=1).summarize()
    # det on the ignore region must not count as FP
    assert s["AP50"] == 1.0


def test_area_ranges():
    # small gt (16x16=256 < 32^2) only contributes to APs
    gts = [mk_gt([[0, 0, 16, 16]], [0])]
    results = [mk_res([[0, 0, 16, 16, 0.9]], [0])]
    s = CocoStyleEval(gts, results, num_classes=1).summarize()
    assert s["APs"] == 1.0
    assert np.isnan(s["APl"])


def test_eval_recalls_proposal_metric():
    """eval_recalls: perfect proposals give AR 1; junk gives 0; the
    CocoDataset 'proposal_fast' metric wires through."""
    import numpy as np

    from boosting_rcnn_tpu.core.evaluation.recall import eval_recalls

    gts = [np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32)]
    perfect = [np.array([[10, 10, 50, 50, 0.9], [60, 60, 90, 90, 0.8]], np.float32)]
    r = eval_recalls(gts, perfect, proposal_nums=(1, 100))
    assert r[1].mean() == 1.0        # both gts recalled with 100 proposals
    assert 0.4 < r[0].mean() <= 0.5  # top-1 proposal recalls only one gt
    junk = [np.array([[0, 0, 5, 5, 0.9]], np.float32)]
    r2 = eval_recalls(gts, junk)
    assert r2.max() == 0.0


def test_segm_area_ranges_use_mask_area():
    """COCOeval segm semantics: area-range binning uses the *mask* area
    (gt: annotation `area`; det: pasted-mask pixel count), not the box
    area.  Construct a case where they disagree: a 100x100 box (large by
    box area) whose mask fills only a 16x16 corner (small by mask area)."""
    from boosting_rcnn_tpu.core.evaluation.coco_eval import SegmCocoStyleEval

    h = w = 200
    box = [0.0, 0.0, 100.0, 100.0]
    # box-relative 28x28 crop: mask occupies the top-left 16% of each axis
    crop = np.zeros((28, 28), np.float32)
    k = int(round(28 * 0.16))
    crop[:k, :k] = 1.0
    mask_area = (0.16 * 100) ** 2  # 256 px -> 'small'
    gt = dict(
        bboxes=np.asarray([box], np.float32),
        labels=np.asarray([0], np.int64),
        bboxes_ignore=np.zeros((0, 4), np.float32),
        height=h,
        width=w,
        segmentations=[[[0.0, 0.0, 16.0, 0.0, 16.0, 16.0, 0.0, 16.0]]],
        areas=np.asarray([mask_area], np.float64),
    )
    dets = np.asarray([box + [0.9]], np.float32)
    results = [(dets, np.asarray([0], np.int64), [crop])]
    ev = SegmCocoStyleEval([gt], results, num_classes=1)
    s = ev.summarize()
    # mask-area binning: contributes to APs, not APl (box-area binning
    # would have put it in APl)
    assert s["APs"] > 0.0
    assert np.isnan(s["APl"])
