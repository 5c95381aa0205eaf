# Boosting R-CNN Res2Net-101 + DCNv2 PAFPN mstrain 3x COCO (reference
# configs/boosting_rcnn/boosting_rcnn_r2_101_dcn_pafpn_mstrain_3x_coco.py:
# DCNv2 in backbone stages 2-4, soft-NMS rcnn test, 36-epoch schedule).
_base_ = ["./boosting_rcnn_r2_101_pafpn_mstrain_2x_coco.py"]

model = dict(
    backbone=dict(
        dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
    ),
    test_cfg=dict(
        rcnn=dict(
            score_thr=0.0001,
            nms=dict(type="soft_nms", iou_threshold=0.7, min_score=0.00),
            max_per_img=200,
        ),
    ),
)

# 3x schedule (reference: step=[27, 33], 36 epochs)
lr_config = dict(step=[27, 33])
runner = dict(type="EpochBasedRunner", max_epochs=36)
