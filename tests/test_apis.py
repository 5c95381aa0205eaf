"""High-level API tests (init_detector / inference_detector round trip)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_CFG = """
model = dict(
    type="FasterRCNN",
    backbone=dict(type="ResNet", depth=18, base_channels=8, frozen_stages=1),
    neck=dict(type="PAFPN", in_channels=[8, 16, 32, 64], out_channels=32,
              start_level=1, add_extra_convs="on_output", num_outs=5),
    rpn_head=dict(
        type="ATSSRPNHead", in_channels=32, feat_channels=32, stacked_convs=2,
        reg_decoded_bbox=True, gamma=0.5,
        anchor_generator=dict(octave_base_scale=4, scales_per_octave=3,
                              ratios=[0.5, 1.0, 2.0], strides=[8, 16, 32, 64, 128]),
        bbox_coder=dict(target_means=[0.0] * 4, target_stds=[1.0] * 4),
        loss_cls=dict(type="FocalLoss", gamma=2.0, alpha=0.25, loss_weight=1.0),
        loss_bbox=dict(type="IoULoss", loss_weight=1.0),
    ),
    roi_head=dict(
        type="ProbRoIHead", boost=True, gamma=0.5,
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=32, featmap_strides=[8, 16, 32, 64, 128]),
        bbox_head=dict(type="ProbConvFCBBoxHead", num_shared_fcs=2,
                       in_channels=32, fc_out_channels=32, roi_feat_size=7,
                       num_classes=4,
                       bbox_coder=dict(target_means=[0.0] * 4,
                                       target_stds=[0.1, 0.1, 0.2, 0.2]),
                       reg_class_agnostic=False,
                       loss_cls=dict(type="CrossEntropyLoss", loss_weight=2.0),
                       loss_bbox=dict(type="L1Loss", loss_weight=2.0)),
    ),
    train_cfg=dict(
        rpn=dict(assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0,
                               match_low_quality=True)),
        rpn_proposal=dict(nms_pre=100, max_per_img=48,
                          nms=dict(iou_threshold=0.7), min_bbox_size=0),
        rcnn=dict(assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6,
                                min_pos_iou=0.6, match_low_quality=False),
                  sampler=dict(type="RandomSampler", num=24, pos_fraction=0.25,
                               add_gt_as_proposals=True)),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=64, max_per_img=24, nms=dict(iou_threshold=0.7),
                 min_bbox_size=0),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.7), max_per_img=20),
    ),
)
data = dict(test=dict(classes=("a", "b", "c", "d")))
"""


@pytest.fixture(scope="module")
def tiny_cfg_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("apicfg") / "tiny_api.py"
    p.write_text(TINY_CFG)
    return str(p)


@pytest.mark.slow
def test_init_and_inference(tiny_cfg_path, tmp_path):
    from boosting_rcnn_tpu.apis import inference_detector, init_detector

    handle = init_detector(tiny_cfg_path, canvas=(128, 160))
    assert handle.classes == ("a", "b", "c", "d")

    rs = np.random.RandomState(0)
    img_path = str(tmp_path / "demo.jpg")
    cv2.imwrite(img_path, (rs.rand(100, 140, 3) * 255).astype(np.uint8))

    # single path input
    result = inference_detector(handle, img_path)
    assert len(result) == 4  # per-class list
    for arr in result:
        assert arr.ndim == 2 and arr.shape[1] == 5

    # array input + batch
    img = (rs.rand(90, 120, 3) * 255).astype(np.uint8)
    results = inference_detector(handle, [img, img])
    assert len(results) == 2

    # scores rescaled to original image coords (within original bounds)
    for arr in result:
        if len(arr):
            assert arr[:, 2].max() <= 140 + 1 and arr[:, 3].max() <= 100 + 1


def test_top_level_imports():
    import boosting_rcnn_tpu as brt

    assert hasattr(brt, "load_config")
    assert hasattr(brt, "build_detector")
    assert brt.__version__
