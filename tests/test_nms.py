"""Tests for the tiled TPU NMS against a sequential greedy reference."""
import numpy as np
import pytest

from boosting_rcnn_tpu.ops import nms as nms_mod
from tests.test_box_ops import np_iou


def greedy_nms(boxes, scores, thr):
    """Sequential greedy NMS (the mmcv/torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > thr
        suppressed[i] = True  # self, already kept
    return keep


@pytest.mark.parametrize("n,tile", [(40, 8), (300, 64), (1000, 256)])
def test_nms_matches_greedy(rng, n, tile):
    boxes = rng.rand(n, 4).astype(np.float32) * 80
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 40
    scores = rng.rand(n).astype(np.float32)
    ob, os_, ov, oi = nms_mod.nms_padded(boxes, scores, 0.5, n, tile=tile)
    got = list(np.asarray(oi)[np.asarray(ov)])
    expected = greedy_nms(boxes, scores, 0.5)
    assert got == expected


def test_nms_respects_valid_mask(rng):
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], np.float32
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    valid = np.array([False, True, True])
    _, _, ov, oi = nms_mod.nms_padded(boxes, scores, 0.5, 3, valid=valid)
    kept = set(np.asarray(oi)[np.asarray(ov)].tolist())
    assert kept == {1, 2}


def test_nms_max_out_truncates(rng):
    n = 50
    boxes = np.zeros((n, 4), np.float32)
    # All disjoint boxes -> all kept, truncated to max_out in score order.
    boxes[:, 0] = np.arange(n) * 20
    boxes[:, 2] = boxes[:, 0] + 10
    boxes[:, 3] = 10
    scores = rng.rand(n).astype(np.float32)
    ob, os_, ov, oi = nms_mod.nms_padded(boxes, scores, 0.5, 10)
    assert np.asarray(ov).all()
    np.testing.assert_array_equal(
        np.asarray(oi), np.argsort(-scores, kind="stable")[:10]
    )
    assert (np.diff(np.asarray(os_)) <= 0).all()


def test_batched_nms_separates_classes():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1])
    _, _, ov, _ = nms_mod.batched_nms_padded(boxes, scores, idxs, 0.5, 2)
    assert np.asarray(ov).sum() == 2  # same box, different class -> both kept
    idxs_same = np.array([0, 0])
    _, _, ov2, _ = nms_mod.batched_nms_padded(boxes, scores, idxs_same, 0.5, 2)
    assert np.asarray(ov2).sum() == 1


def test_multiclass_nms(rng):
    n, c = 30, 4
    boxes = rng.rand(n, 4).astype(np.float32) * 80
    boxes[:, 2:] = boxes[:, :2] + 10
    scores = rng.rand(n, c).astype(np.float32)
    scores[scores < 0.3] = 0.0
    dets, labels, valid = nms_mod.multiclass_nms_padded(
        boxes, scores, score_thr=0.05, iou_threshold=0.5, max_per_img=120
    )
    dets, labels, valid = map(np.asarray, (dets, labels, valid))
    assert dets.shape == (120, 5) and labels.shape == (120,)
    # Every valid det's score must exceed the threshold.
    assert (dets[valid, 4] > 0.05).all()
    # Per-class: check against greedy on that class's survivors.
    for cls in range(c):
        m = scores[:, cls] > 0.05
        exp = greedy_nms(boxes[m], scores[m, cls], 0.5)
        got = dets[valid & (labels == cls)]
        assert len(got) == len(exp)
        np.testing.assert_allclose(
            np.sort(got[:, 4]), np.sort(scores[m, cls][exp]), rtol=1e-6
        )


def test_soft_nms_gaussian(rng):
    from boosting_rcnn_tpu.ops.nms import soft_nms_padded

    n = 30
    boxes = rng.rand(n, 4).astype(np.float32) * 60
    boxes[:, 2:] = boxes[:, :2] + 10 + rng.rand(n, 2).astype(np.float32) * 30
    scores = rng.rand(n).astype(np.float32)

    def ref(k, sigma=0.5):
        s = scores.copy()
        out = []
        for _ in range(k):
            i = int(np.argmax(s))
            if s[i] <= 1e-3:
                break
            out.append((i, s[i]))
            ious = np_iou(boxes[i : i + 1], boxes)[0]
            s = s * np.exp(-(ious**2) / sigma)
            s[i] = -1e30
        return out

    exp = ref(15)
    _, os_, ov, oi = soft_nms_padded(
        boxes, scores, 15, method="gaussian", sigma=0.5
    )
    got = [
        (int(i), float(v))
        for i, v, valid in zip(np.asarray(oi), np.asarray(os_), np.asarray(ov))
        if valid
    ]
    assert [g[0] for g in got] == [e[0] for e in exp]
    np.testing.assert_allclose(
        [g[1] for g in got], [e[1] for e in exp], rtol=1e-4
    )


@pytest.mark.parametrize("n,max_out,tile", [(2000, 150, 256), (4096, 300, 256)])
def test_nms_kept_buffer_stress(rng, n, max_out, tile):
    """Many tiles + truncation: exercises the compacted survivor buffer
    (suppression of late tiles must come from the scatter-compacted kept
    boxes, across several buffer-filling rounds)."""
    boxes = rng.rand(n, 4).astype(np.float32) * 300
    boxes[:, 2:] = boxes[:, :2] + 3 + rng.rand(n, 2).astype(np.float32) * 60
    scores = rng.rand(n).astype(np.float32)
    ob, os_, ov, oi = nms_mod.nms_padded(boxes, scores, 0.6, max_out, tile=tile)
    got = np.asarray(oi)[np.asarray(ov)].tolist()
    expected = greedy_nms(boxes, scores, 0.6)[:max_out]
    assert got == expected
