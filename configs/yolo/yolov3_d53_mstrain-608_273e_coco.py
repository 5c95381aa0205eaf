# YOLOv3 DarkNet-53 multi-scale 608 273e COCO (reference
# configs/yolo/yolov3_d53_mstrain-608_273e_coco.py: GridAssigner 0.5/0.5,
# conf_thr 0.005, nms 0.45; SGD lr 1e-3 wd 5e-4, linear warmup 2000,
# steps [218, 246] of 273 epochs).
_base_ = ["../_base_/default_runtime.py"]

model = dict(
    type="YOLOV3",
    backbone=dict(
        type="Darknet",
        depth=53,
        out_indices=(3, 4, 5),
        init_cfg=dict(type="Pretrained", checkpoint="open-mmlab://darknet53"),
    ),
    neck=dict(
        type="YOLOV3Neck",
        num_scales=3,
        in_channels=[1024, 512, 256],
        out_channels=[512, 256, 128],
    ),
    bbox_head=dict(
        type="YOLOV3Head",
        num_classes=80,
        in_channels=[512, 256, 128],
        out_channels=[1024, 512, 256],
        anchor_generator=dict(
            type="YOLOAnchorGenerator",
            base_sizes=[
                [(116, 90), (156, 198), (373, 326)],
                [(30, 61), (62, 45), (59, 119)],
                [(10, 13), (16, 30), (33, 23)],
            ],
            strides=[32, 16, 8],
        ),
        bbox_coder=dict(type="YOLOBBoxCoder"),
        featmap_strides=[32, 16, 8],
        loss_cls=dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=1.0,
            reduction="sum",
        ),
        loss_conf=dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=1.0,
            reduction="sum",
        ),
        loss_xy=dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=2.0,
            reduction="sum",
        ),
        loss_wh=dict(type="MSELoss", loss_weight=2.0, reduction="sum"),
    ),
    train_cfg=dict(
        assigner=dict(
            type="GridAssigner", pos_iou_thr=0.5, neg_iou_thr=0.5,
            min_pos_iou=0,
        )
    ),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        conf_thr=0.005,
        nms=dict(iou_threshold=0.45),
        max_per_img=100,
    ),
)

data = dict(
    samples_per_gpu=8,
    train=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_train2017.json",
        img_prefix="data/coco/train2017/",
        # reference mstrain 320..608 square value-mode -> short-side jitter
        pipeline=dict(
            scale=(608, 608), canvas=(608, 608), flip_prob=0.5,
            mstrain_range=(320, 608), max_gt=100,
        ),
    ),
    val=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_val2017.json",
        img_prefix="data/coco/val2017/",
        pipeline=dict(scale=(608, 608), canvas=(608, 608)),
    ),
    test=dict(
        type="CocoDataset",
        ann_file="data/coco/annotations/instances_val2017.json",
        img_prefix="data/coco/val2017/",
        pipeline=dict(scale=(608, 608), canvas=(608, 608)),
    ),
)

optimizer = dict(type="SGD", lr=0.001, momentum=0.9, weight_decay=0.0005)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=2000, warmup_ratio=0.1,
    step=[218, 246],
)
runner = dict(type="EpochBasedRunner", max_epochs=273)
evaluation = dict(interval=1, metric=["bbox"])
