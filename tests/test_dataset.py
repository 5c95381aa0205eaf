"""Dataset round-trip tests with a fake COCO json (the reference's
``_create_dummy_coco_json`` strategy, ``tests/test_data/test_datasets/
test_common.py:21``)."""
import json
import os

import numpy as np
import pytest

from boosting_rcnn_tpu.data.coco import CocoDataset


@pytest.fixture
def fake_coco(tmp_path):
    anns = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 120, "height": 90},
        ],
        "categories": [
            {"id": 7, "name": "echinus"},
            {"id": 9, "name": "starfish"},
        ],
        "annotations": [
            {
                "id": 1, "image_id": 1, "category_id": 7,
                "bbox": [10, 10, 30, 20], "area": 600, "iscrowd": 0,
                "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]],
            },
            {
                "id": 2, "image_id": 1, "category_id": 9,
                "bbox": [50, 40, 20, 20], "area": 400, "iscrowd": 0,
                "segmentation": [[50, 40, 70, 40, 70, 60, 50, 60]],
            },
            {
                "id": 3, "image_id": 2, "category_id": 7,
                "bbox": [5, 5, 40, 40], "area": 1600, "iscrowd": 0,
                "segmentation": [[5, 5, 45, 5, 45, 45, 5, 45]],
            },
            {  # crowd -> ignore region
                "id": 4, "image_id": 2, "category_id": 7,
                "bbox": [60, 60, 20, 20], "area": 400, "iscrowd": 1,
                "segmentation": {"counts": [8100, 300], "size": [90, 120]},
            },
        ],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(anns))
    return str(p)


def test_dataset_parsing(fake_coco):
    ds = CocoDataset(fake_coco, test_mode=True)
    assert len(ds) == 2
    assert ds.CLASSES == ("echinus", "starfish")
    d0 = ds.data_infos[0]
    np.testing.assert_allclose(d0["bboxes"], [[10, 10, 40, 30], [50, 40, 70, 60]])
    np.testing.assert_array_equal(d0["labels"], [0, 1])
    d1 = ds.data_infos[1]
    assert len(d1["bboxes_ignore"]) == 1  # crowd
    assert ds.flags.tolist() == [1, 1]  # both landscape


def test_perfect_results_full_ap(fake_coco):
    ds = CocoDataset(fake_coco, test_mode=True)
    results = []
    for d in ds.data_infos:
        dets = np.concatenate(
            [d["bboxes"], np.full((len(d["bboxes"]), 1), 0.9, np.float32)], axis=1
        )
        results.append((dets, d["labels"].copy()))
    m = ds.evaluate(results)
    assert m["bbox_mAP"] == 1.0 and m["bbox_mAP_50"] == 1.0


def test_segm_eval_round_trip(fake_coco):
    ds = CocoDataset(fake_coco, test_mode=True)
    results = []
    for d in ds.data_infos:
        n = len(d["bboxes"])
        dets = np.concatenate(
            [d["bboxes"], np.full((n, 1), 0.9, np.float32)], axis=1
        )
        # perfect box-filling masks (the fake polygons ARE the boxes)
        masks = np.ones((n, 28, 28), np.float32)
        results.append((dets, d["labels"].copy(), masks))
    m = ds.evaluate(results, metric=["bbox", "segm"])
    assert m["bbox_mAP"] == 1.0
    assert m["segm_mAP_50"] == 1.0


def test_results_to_coco_json(fake_coco):
    ds = CocoDataset(fake_coco, test_mode=True)
    dets = np.array([[10, 10, 40, 30, 0.8]], np.float32)
    out = ds.results_to_coco_json([(dets, np.array([0])), (np.zeros((0, 5)), np.zeros(0))])
    assert out[0]["category_id"] == 7
    assert out[0]["bbox"] == [10, 10, 30, 20]


def test_filter_empty_gt(tmp_path):
    anns = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.jpg", "width": 100, "height": 80},
        ],
        "categories": [{"id": 1, "name": "x"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
             "area": 100, "iscrowd": 0}
        ],
    }
    p = tmp_path / "a.json"
    p.write_text(json.dumps(anns))
    assert len(CocoDataset(str(p))) == 1  # train mode filters empty
    assert len(CocoDataset(str(p), test_mode=True)) == 2


def test_lvis_dataset_federated_eval(tmp_path):
    """LVIS parsing (coco_url file names, neg_category_ids) + federated AP:
    a category's AP is only computed over verified images."""
    import json

    import numpy as np

    from boosting_rcnn_tpu.data.lvis import LvisDataset

    ann = {
        "images": [
            # img 1: has cat1 gt, cat2 unverified
            {"id": 1, "width": 100, "height": 100,
             "coco_url": "http://images.cocodataset.org/train2017/a.jpg",
             "neg_category_ids": []},
            # img 2: has cat2 gt, cat1 verified-negative
            {"id": 2, "width": 100, "height": 100,
             "coco_url": "http://images.cocodataset.org/train2017/b.jpg",
             "neg_category_ids": [1]},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 20, 20], "area": 400, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 2,
             "bbox": [30, 30, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "cat1"}, {"id": 2, "name": "cat2"}],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(ann))
    ds = LvisDataset(str(p), test_mode=True, filter_empty_gt=False)
    assert ds.data_infos[0]["filename"] == "train2017/a.jpg"
    assert len(ds) == 2

    perfect1 = np.array([[10, 10, 30, 30, 0.9]], np.float32)
    perfect2 = np.array([[30, 30, 50, 50, 0.9]], np.float32)
    empty = np.zeros((0, 5), np.float32)
    # image 1: perfect cat1 det + a false-positive cat2 det.  Because img 1
    # is UNVERIFIED for cat2 (no gt, not in neg_category_ids), federated
    # eval must ignore that false positive.
    fp2 = np.array([[0, 0, 9, 9, 0.99]], np.float32)
    results = [[perfect1, fp2], [empty, perfect2]]
    m = ds.evaluate(results)
    assert m["bbox_mAP"] > 0.99, m
    # sanity: a false positive on a VERIFIED image does hurt
    fp1_on_img2 = np.array([[0, 0, 9, 9, 0.99]], np.float32)
    results_bad = [[perfect1, fp2], [fp1_on_img2, perfect2]]
    m_bad = ds.evaluate(results_bad)
    assert m_bad["bbox_mAP"] < m["bbox_mAP"], (m_bad, m)
    # engine-format results ((dets, labels) per image) give the same score
    eng = [
        (np.concatenate([perfect1, fp2]), np.array([0, 1])),
        (np.concatenate([empty, perfect2]), np.array([1])),
    ]
    m_eng = ds.evaluate(eng)
    assert abs(m_eng["bbox_mAP"] - m["bbox_mAP"]) < 1e-9


def test_loader_mosaic_mixup_wiring(fake_coco, tmp_path):
    """YOLOX train recipe: mosaic_prob=1 routes every sample through the
    4-image mosaic (+ mixup) composition before the fused resize/pad, and
    the batch keeps its fixed padded shapes."""
    import cv2

    from boosting_rcnn_tpu.data.loader import DetDataLoader

    ds = CocoDataset(ann_file=fake_coco, img_prefix=str(tmp_path))
    rs = np.random.RandomState(0)
    for info in ds.data_infos:
        img = (rs.rand(info["height"], info["width"], 3) * 255).astype(
            np.uint8
        )
        cv2.imwrite(os.path.join(str(tmp_path), info["filename"]), img)

    loader = DetDataLoader(
        ds, batch_size=2, canvas=(64, 64), scale=(64, 64), train=True,
        max_gt=20, mosaic_prob=1.0, mixup_prob=1.0, prefetch=1,
    )
    batch = next(loader.epoch_iter(0))
    assert batch["images"].shape == (2, 64, 64, 3)
    assert batch["gt_bboxes"].shape == (2, 20, 4)
    # mosaic of 2-image dataset with gt on every image -> multiple gts land
    assert batch["gt_mask"].sum() >= 2
    # boxes stay inside the canvas
    valid = batch["gt_bboxes"][batch["gt_mask"].astype(bool)]
    assert (valid[:, 2:] <= 64 + 1e-3).all() and (valid >= -1e-3).all()
