"""Pipeline transform tests (reference ``tests/test_data/test_pipelines``)."""
import numpy as np
import pytest

from boosting_rcnn_tpu.data import transforms as T


@pytest.fixture
def img(rng):
    return (rng.rand(60, 80, 3) * 255).astype(np.uint8)


def test_photo_metric_distortion_shape(img):
    rng = np.random.RandomState(1)
    out = T.photo_metric_distortion(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_expand_boxes_shift(img):
    rng = np.random.RandomState(0)
    boxes = np.array([[10, 10, 30, 30]], np.float32)
    out, b = T.expand(img, boxes, rng, prob=1.0)
    assert out.shape[0] >= img.shape[0] and out.shape[1] >= img.shape[1]
    # box stays the same size, shifted inside the new canvas
    np.testing.assert_allclose(b[0, 2] - b[0, 0], 20)
    assert b[0, 0] >= 0 and b[0, 2] <= out.shape[1]


def test_min_iou_random_crop_keeps_center_boxes(img):
    rng = np.random.RandomState(3)
    boxes = np.array([[20, 20, 40, 40]], np.float32)
    labels = np.array([2])
    out, b, l = T.min_iou_random_crop(img, boxes, labels, rng)
    assert out.ndim == 3
    assert len(b) == len(l)
    if len(b):
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_random_crop(img):
    rng = np.random.RandomState(0)
    boxes = np.array([[10, 10, 30, 30], [70, 50, 79, 59]], np.float32)
    labels = np.array([0, 1])
    out, b, l = T.random_crop(img, boxes, labels, rng, (40, 50))
    assert out.shape[:2] == (40, 50)
    assert len(b) == len(l) <= 2


def test_cutout(img):
    rng = np.random.RandomState(0)
    out = T.cutout(img, rng)
    assert out.shape == img.shape
    assert (out != img).any()


def test_mosaic(rng):
    imgs = [(rng.rand(50, 60, 3) * 255).astype(np.uint8) for _ in range(4)]
    boxes = [np.array([[5, 5, 20, 20]], np.float32) for _ in range(4)]
    labels = [np.array([i]) for i in range(4)]
    r = np.random.RandomState(0)
    canvas, b, l = T.mosaic(imgs, boxes, labels, r, out_size=(64, 64))
    assert canvas.shape == (128, 128, 3)
    assert len(b) == len(l)
    if len(b):
        assert (b >= 0).all() and (b[:, [0, 2]] <= 128).all()


def test_mixup(rng):
    i1 = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
    i2 = (rng.rand(50, 30, 3) * 255).astype(np.uint8)
    b1 = np.array([[0, 0, 10, 10]], np.float32)
    b2 = np.array([[5, 5, 15, 15]], np.float32)
    out, b, l = T.mixup(i1, b1, np.array([0]), i2, b2, np.array([1]), np.random.RandomState(0))
    assert out.shape == (50, 40, 3)
    assert len(b) == 2 and len(l) == 2


def test_autoaugment_geometric_box_consistency():
    """Rotate/shear/translate must keep boxes on the transformed content:
    a bright square's box still covers bright pixels after each op."""
    import numpy as np

    from boosting_rcnn_tpu.data import auto_augment as A

    img = np.zeros((80, 120, 3), np.uint8)
    img[20:50, 30:70] = 255
    boxes = np.asarray([[30.0, 20, 70, 50]], np.float32)
    labels = np.asarray([1])

    for name, fn in (
        ("rotate", lambda: A.rotate(img, boxes, labels, 15.0)),
        ("shear", lambda: A.shear(img, boxes, labels, 0.2, "x")),
        ("translate", lambda: A.translate(img, boxes, labels, 14.0, "y")),
    ):
        im2, b2, l2 = fn()
        assert len(b2) == 1, name
        x1, y1, x2, y2 = [int(round(v)) for v in b2[0]]
        inside = im2[y1:y2, x1:x2].mean()
        outside_mean = im2.mean()
        assert inside > outside_mean, name  # box tracks the bright content

    # policy chooser runs clean over many draws
    rs = np.random.RandomState(0)
    for _ in range(10):
        im3, b3, l3 = A.apply_policy(img, boxes, labels, rs)
        assert im3.shape == img.shape
        assert (b3[:, 2:] >= b3[:, :2] - 1e-3).all()


def test_autoaugment_in_loader(tmp_path):
    import cv2
    import json

    from boosting_rcnn_tpu.data.coco import CocoDataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    ann = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 96,
                    "height": 64}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    cv2.imwrite(
        str(tmp_path / "x.jpg"),
        (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8),
    )
    ds = CocoDataset(ann_file=str(p), img_prefix=str(tmp_path))
    loader = DetDataLoader(
        ds, batch_size=1, canvas=(64, 96), scale=(96, 64), train=True,
        max_gt=10, autoaugment=True, prefetch=1,
    )
    batch = next(loader.epoch_iter(0))
    assert batch["images"].shape == (1, 64, 96, 3)


def test_large_scale_jitter_geometry():
    """LSJ (reference common/lsj_100e pipeline): keep-ratio resize toward
    canvas*r, then crop to canvas; boxes/polygons track the geometry."""
    rng = np.random.RandomState(3)
    img = (rng.rand(100, 80, 3) * 255).astype(np.uint8)
    boxes = np.array([[10.0, 20.0, 50.0, 60.0]], np.float32)
    labels = np.array([1])
    segs = [[np.array([10, 20, 50, 20, 50, 60, 10, 60], np.float32)]]
    canvas = (64, 64)

    # downscale branch (r<1): exact scale, no crop
    im2, b2, l2, s2 = T.large_scale_jitter(
        img, boxes, labels, segs, np.random.RandomState(0), canvas,
        ratio_range=(0.5, 0.5))
    f = min(canvas[0] * 0.5 / 100, canvas[1] * 0.5 / 80)
    assert im2.shape[0] <= canvas[0] and im2.shape[1] <= canvas[1]
    np.testing.assert_allclose(b2, boxes * f, atol=1.0)
    np.testing.assert_allclose(s2[0][0], segs[0][0] * f, atol=1e-5)

    # upscale branch (r=2): image fills the canvas exactly, boxes clipped
    im3, b3, l3, s3 = T.large_scale_jitter(
        img, boxes, labels, segs, np.random.RandomState(1), canvas,
        ratio_range=(2.0, 2.0))
    assert im3.shape[:2] == canvas
    if len(b3):
        assert (b3[:, [0, 2]] <= canvas[1]).all()
        assert (b3[:, [1, 3]] <= canvas[0]).all()
        assert (b3 >= 0).all()
        # polygon stays consistent with its box (same frame): the polygon
        # bbox must contain the clipped box center
        px, py = s3[0][0][0::2], s3[0][0][1::2]
        cx = (b3[0, 0] + b3[0, 2]) / 2
        cy = (b3[0, 1] + b3[0, 3]) / 2
        assert px.min() - 1 <= cx <= px.max() + 1
        assert py.min() - 1 <= cy <= py.max() + 1


def _tiny_coco(tmp_path):
    import cv2
    import json

    from boosting_rcnn_tpu.data.coco import CocoDataset

    ann = {
        "images": [{"id": 1, "file_name": "x.jpg", "width": 96,
                    "height": 64}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 40, 30], "area": 1200, "iscrowd": 0,
             "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]]},
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    cv2.imwrite(
        str(tmp_path / "x.jpg"),
        (np.random.RandomState(0).rand(64, 96, 3) * 255).astype(np.uint8),
    )
    return CocoDataset(ann_file=str(p), img_prefix=str(tmp_path))


def test_lsj_in_loader(tmp_path):
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    ds = _tiny_coco(tmp_path)
    loader = DetDataLoader(
        ds, batch_size=1, canvas=(64, 64), scale=(64, 64), train=True,
        max_gt=10, lsj_range=(0.1, 2.0), with_masks=True, prefetch=1,
    )
    for epoch in range(3):  # several draws cover both LSJ branches
        batch = next(loader.epoch_iter(epoch))
        assert batch["images"].shape == (1, 64, 64, 3)
        assert np.isfinite(batch["images"]).all()
        b = batch["gt_bboxes"][0][batch["gt_mask"][0]]
        if len(b):
            assert (b[:, 2:] >= b[:, :2]).all()
            assert (b <= 64).all() and (b >= 0).all()


def test_ssd_aug_in_loader(tmp_path):
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    ds = _tiny_coco(tmp_path)
    loader = DetDataLoader(
        ds, batch_size=1, canvas=(64, 64), scale=(64, 64), train=True,
        max_gt=10, ssd_aug=True, prefetch=1,
    )
    batch = next(loader.epoch_iter(0))
    assert batch["images"].shape == (1, 64, 64, 3)
    assert np.isfinite(batch["images"]).all()
