# Boosting R-CNN ResNeXt-101-64x4d PAFPN mstrain 3x COCO (reference
# configs/boosting_rcnn/boosting_rcnn_x101_pafpn_mstrain_3x_coco: fp16,
# X101-64x4d backbone, PAFPN, rpn gamma=2, soft-NMS rcnn test, 36 epochs,
# mstrain up to short side 960).
_base_ = "./boosting_rcnn_r50_fpn_1x_coco.py"
fp16 = dict(loss_scale=512.0)  # bf16 compute on TPU
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeXt",
        depth=101,
        groups=64,
        base_width=4,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        style="pytorch",
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://resnext101_64x4d"
        ),
    ),
    neck=dict(
        _delete_=True,
        type="PAFPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_output",
        num_outs=5,
    ),
    # the 3x COCO recipe reverts to decoded-box IoULoss regression
    # (reference rpn_head block: reg_decoded_bbox=True, FocalLoss cls,
    # IoULoss box) unlike the 1x COCO config's CIoU-on-deltas branch
    rpn_head=dict(
        reg_decoded_bbox=True,
        gamma=2,
        loss_bbox=dict(_delete_=True, type="IoULoss", loss_weight=2.0),
        aug_reg_loss=dict(type="MSELoss", loss_weight=2.0),
    ),
    test_cfg=dict(
        rcnn=dict(
            score_thr=0.05,
            nms=dict(type="soft_nms", iou_threshold=0.7, min_score=0.0),
            max_per_img=100,
        ),
    ),
)
data = dict(
    samples_per_gpu=7,
    workers_per_gpu=7,
    train=dict(pipeline=dict(mstrain_range=(480, 960))),
)
lr_config = dict(step=[27, 33])
runner = dict(type="EpochBasedRunner", max_epochs=36)
evaluation = dict(interval=3, metric="bbox")
