"""Golden-value tests for box primitives (pins reference numerics).

Golden values follow the reference's own doctest examples
(e.g. ``delta_xywh_bbox_coder.py`` delta2bbox docstring) and a numpy
re-derivation of mmdet IoU.
"""
import numpy as np
import pytest

from boosting_rcnn_tpu.ops import box_ops


def np_iou(b1, b2, mode="iou", eps=1e-6):
    a1 = np.maximum(b1[:, 2] - b1[:, 0], 0) * np.maximum(b1[:, 3] - b1[:, 1], 0)
    a2 = np.maximum(b2[:, 2] - b2[:, 0], 0) * np.maximum(b2[:, 3] - b2[:, 1], 0)
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    ov = wh[..., 0] * wh[..., 1]
    if mode == "iof":
        union = a1[:, None]
    else:
        union = a1[:, None] + a2[None, :] - ov
    return ov / np.maximum(union, eps)


def test_iou_matches_numpy(rng):
    b1 = rng.rand(13, 4).astype(np.float32) * 100
    b2 = rng.rand(7, 4).astype(np.float32) * 100
    b1[:, 2:] += b1[:, :2]
    b2[:, 2:] += b2[:, :2]
    got = np.asarray(box_ops.bbox_overlaps(b1, b2))
    np.testing.assert_allclose(got, np_iou(b1, b2), rtol=1e-5, atol=1e-5)
    got_iof = np.asarray(box_ops.bbox_overlaps(b1, b2, mode="iof"))
    np.testing.assert_allclose(got_iof, np_iou(b1, b2, "iof"), rtol=1e-5, atol=1e-5)


def test_iou_known_values():
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    got = np.asarray(box_ops.bbox_overlaps(b1, b2))[0]
    np.testing.assert_allclose(got, [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_giou_sign():
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[20, 0, 30, 10]], np.float32)
    giou = np.asarray(box_ops.bbox_overlaps(b1, b2, mode="giou"))[0, 0]
    # disjoint boxes: giou = -(enclosure - union)/enclosure = -(300-200)/300
    np.testing.assert_allclose(giou, -100.0 / 300.0, atol=1e-5)


def test_delta2bbox_reference_doctest():
    # Golden values from the reference delta2bbox docstring
    # (delta_xywh_bbox_coder.py:196-206).
    rois = np.array(
        [[0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [0.0, 0.0, 1.0, 1.0], [5.0, 5.0, 5.0, 5.0]],
        np.float32,
    )
    deltas = np.array(
        [[0, 0, 0, 0], [1, 1, 1, 1], [0, 0, 2, -1], [0.7, -1.9, -0.5, 0.3]],
        np.float32,
    )
    out = np.asarray(box_ops.delta2bbox(rois, deltas, max_shape=np.array([32, 32])))
    expected = np.array(
        [
            [0.0000, 0.0000, 1.0000, 1.0000],
            [0.1409, 0.1409, 2.8591, 2.8591],
            [0.0000, 0.3161, 4.1945, 0.6839],
            [5.0000, 5.0000, 5.0000, 5.0000],
        ],
        np.float32,
    )
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_encode_decode_roundtrip(rng):
    props = rng.rand(20, 4).astype(np.float32) * 50
    props[:, 2:] += props[:, :2] + 1
    gt = rng.rand(20, 4).astype(np.float32) * 50
    gt[:, 2:] += gt[:, :2] + 1
    means = (0.0, 0.0, 0.0, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    deltas = box_ops.bbox2delta(props, gt, means, stds)
    back = np.asarray(box_ops.delta2bbox(props, np.asarray(deltas), means, stds))
    np.testing.assert_allclose(back, gt, rtol=1e-3, atol=1e-3)


def test_delta2bbox_classwise_shape():
    rois = np.array([[0, 0, 10, 10]], np.float32)
    deltas = np.zeros((1, 12), np.float32)
    out = np.asarray(box_ops.delta2bbox(rois, deltas))
    assert out.shape == (1, 12)
    np.testing.assert_allclose(out.reshape(3, 4), np.tile(rois, (3, 1)), atol=1e-5)


def test_wh_ratio_clip():
    rois = np.array([[0, 0, 10, 10]], np.float32)
    deltas = np.array([[0, 0, 100.0, -100.0]], np.float32)
    out = np.asarray(box_ops.delta2bbox(rois, deltas))[0]
    max_ratio = abs(np.log(16 / 1000))
    w = out[2] - out[0]
    np.testing.assert_allclose(w, 10 * np.exp(max_ratio), rtol=1e-5)


def test_tblr_roundtrip(rng):
    from boosting_rcnn_tpu.ops.coders import bboxes2tblr, tblr2bboxes

    priors = rng.rand(10, 4).astype(np.float32) * 50
    priors[:, 2:] += priors[:, :2] + 5
    gts = rng.rand(10, 4).astype(np.float32) * 50
    gts[:, 2:] += gts[:, :2] + 5
    enc = bboxes2tblr(priors, gts)
    back = np.asarray(tblr2bboxes(priors, np.asarray(enc)))
    np.testing.assert_allclose(back, gts, rtol=1e-4, atol=1e-4)


def test_distance_roundtrip(rng):
    from boosting_rcnn_tpu.ops.coders import bbox2distance, distance2bbox

    pts = rng.rand(8, 2).astype(np.float32) * 100
    boxes = np.stack(
        [pts[:, 0] - 10, pts[:, 1] - 5, pts[:, 0] + 8, pts[:, 1] + 12], -1
    ).astype(np.float32)
    d = bbox2distance(pts, boxes)
    back = np.asarray(distance2bbox(pts, np.asarray(d)))
    np.testing.assert_allclose(back, boxes, rtol=1e-5, atol=1e-5)


def test_yolo_roundtrip(rng):
    from boosting_rcnn_tpu.ops.coders import yolo_decode, yolo_encode

    anchors = np.array([[0, 0, 32, 32], [16, 16, 80, 48]], np.float32)
    gts = np.array([[2, 4, 30, 28], [20, 10, 70, 50]], np.float32)
    enc = yolo_encode(anchors, gts, stride=16.0)
    back = np.asarray(yolo_decode(anchors, np.asarray(enc), stride=16.0))
    np.testing.assert_allclose(back, gts, rtol=1e-3, atol=1e-2)
