"""VOC-style eval + dataset wrapper tests."""
import numpy as np

from boosting_rcnn_tpu.core.evaluation.mean_ap import (
    average_precision,
    eval_map,
    eval_recalls,
)


def ann(boxes, labels):
    return dict(
        bboxes=np.asarray(boxes, np.float32).reshape(-1, 4),
        labels=np.asarray(labels, np.int64),
        bboxes_ignore=np.zeros((0, 4), np.float32),
    )


def res(dets, labels):
    return (
        np.asarray(dets, np.float32).reshape(-1, 5),
        np.asarray(labels, np.int64),
    )


def test_perfect_map():
    anns = [ann([[0, 0, 10, 10]], [0]), ann([[5, 5, 30, 30]], [1])]
    results = [
        res([[0, 0, 10, 10, 0.9]], [0]),
        res([[5, 5, 30, 30, 0.8]], [1]),
    ]
    m, per_class = eval_map(results, anns, num_classes=2)
    assert m == 1.0
    assert per_class[0]["ap"] == 1.0 and per_class[1]["ap"] == 1.0


def test_fp_lowers_precision():
    anns = [ann([[0, 0, 10, 10]], [0])]
    results = [
        res([[50, 50, 60, 60, 0.95], [0, 0, 10, 10, 0.9]], [0, 0])
    ]
    m, pc = eval_map(results, anns, num_classes=1)
    # recall 1 at precision 1/2 (high-scored FP first) -> AP = 0.5
    assert abs(m - 0.5) < 1e-6


def test_difficult_ignored():
    a = ann([[0, 0, 10, 10]], [0])
    a["bboxes_ignore"] = np.array([[50, 50, 60, 60]], np.float32)
    results = [
        res([[0, 0, 10, 10, 0.9], [50, 50, 60, 60, 0.8]], [0, 0])
    ]
    m, _ = eval_map(results, [a], num_classes=1)
    assert m == 1.0  # det on ignore region is neither tp nor fp


def test_average_precision_11points():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 0.5])
    ap_area = average_precision(rec, prec, "area")
    ap_11 = average_precision(rec, prec, "11points")
    assert 0 < ap_11 <= 1 and 0 < ap_area <= 1


def test_eval_recalls():
    gts = [np.array([[0, 0, 10, 10]], np.float32)]
    props = [np.array([[0, 0, 10, 10, 0.9], [40, 40, 60, 60, 0.5]], np.float32)]
    r = eval_recalls(gts, props, proposal_nums=(1, 2), iou_thrs=(0.5,))
    assert r[0, 0] == 1.0 and r[1, 0] == 1.0


def test_dataset_wrappers():
    from boosting_rcnn_tpu.data.dataset_wrappers import (
        ClassBalancedDataset,
        ConcatDataset,
        RepeatDataset,
    )

    class Fake:
        CLASSES = ("a", "b")

        def __init__(self, n, label):
            self.data_infos = [
                dict(labels=np.array([label]), filename=f"{label}_{i}.jpg")
                for i in range(n)
            ]
            self.flags = np.zeros(n, np.uint8)

        def __len__(self):
            return len(self.data_infos)

        def img_path(self, i):
            return self.data_infos[i]["filename"]

    d1, d2 = Fake(10, 0), Fake(2, 1)
    cat = ConcatDataset([d1, d2])
    assert len(cat) == 12 and cat.img_path(10) == "1_0.jpg"
    rep = RepeatDataset(d2, 3)
    assert len(rep) == 6 and rep.img_path(5) == "1_1.jpg"
    bal = ClassBalancedDataset(ConcatDataset([d1, d2]), oversample_thr=0.5)
    # rare class (freq 2/12) must be oversampled relative to common
    labels = [int(d["labels"][0]) for d in bal.data_infos]
    assert labels.count(1) / 2 > labels.count(0) / 10
