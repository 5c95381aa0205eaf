# Deformable DETR R50 50e COCO (reference
# configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

model = dict(
    type="DeformableDETR",
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet50"),
    ),
    neck=dict(
        type="ChannelMapper",
        in_channels=[512, 1024, 2048],
        kernel_size=1,
        out_channels=256,
        num_outs=4,
    ),
    bbox_head=dict(
        type="DeformableDETRHead",
        num_query=300,
        num_classes=80,
        embed_dims=256,
        transformer=dict(
            num_heads=8,
            num_points=4,
            num_encoder_layers=6,
            num_decoder_layers=6,
            feedforward_channels=1024,
        ),
        loss_cls=dict(
            type="FocalLoss", use_sigmoid=True, gamma=2.0, alpha=0.25,
            loss_weight=2.0,
        ),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0),
    ),
    train_cfg=dict(
        assigner=dict(
            type="HungarianAssigner",
            cls_cost=dict(type="FocalLossCost", weight=2.0),
            reg_cost=dict(type="BBoxL1Cost", weight=5.0,
                          box_format="xywh"),
            iou_cost=dict(type="IoUCost", iou_mode="giou", weight=2.0),
        ),
    ),
    test_cfg=dict(max_per_img=100),
)
optimizer = dict(type="AdamW", lr=0.0002, weight_decay=0.0001)
