# Boosting R-CNN Res2Net-101(+DCNv2 stages 2-4) mstrain 3x COCO
# (reference configs/boosting_rcnn/boosting_rcnn_r2_101_fpn_mstrain_3x_coco
# — the file keeps "fpn" in its name but wires a PAFPN).  Deltas from the
# UTDAC base: Res2Net-101 DCN backbone, rpn gamma=2, roi reg_norm='mean',
# 80 classes, soft-NMS at score_thr 0, AutoAugment-mstrain train pipeline
# (the reference's two-policy Resize/RandomCrop schedule is represented by
# the loader's value-mode mstrain jitter), 36-epoch schedule.
_base_ = [
    "./boosting_rcnn_r50_pafpn_1x_utdac.py",
    "../_base_/datasets/coco_detection.py",
]

model = dict(
    backbone=dict(
        _delete_=True,
        type="Res2Net",
        depth=101,
        scales=4,
        base_width=26,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://res2net101_v1d_26w_4s",
        ),
    ),
    rpn_head=dict(gamma=2),
    roi_head=dict(
        reg_norm="mean",
        bbox_head=dict(num_classes=80),
    ),
    test_cfg=dict(
        rcnn=dict(
            score_thr=0.0,
            nms=dict(type="soft_nms", iou_threshold=0.7, min_score=0.0),
            max_per_img=100,
        ),
    ),
)
data = dict(
    samples_per_gpu=6,
    workers_per_gpu=6,
    train=dict(pipeline=dict(mstrain_range=(480, 800))),
)
lr_config = dict(step=[27, 33])
runner = dict(type="EpochBasedRunner", max_epochs=36)
evaluation = dict(interval=3, metric="bbox")
