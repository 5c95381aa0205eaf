# Reference configs/ssd/ssdlite_mobilenetv2_scratch_600e_coco (SSDLite:
# MobileNetV2 + depthwise SSDNeck extras + depthwise prediction convs,
# trained from scratch at 320x320).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="SSD",
    backbone=dict(
        type="MobileNetV2",
        out_indices=(4, 7),
        norm_eval=False,
        init_cfg=None,  # scratch training
    ),
    neck=dict(
        type="SSDNeck",
        in_channels=(96, 1280),
        out_channels=(96, 1280, 512, 256, 256, 128),
        level_strides=(2, 2, 2, 2),
        level_paddings=(1, 1, 1, 1),
        use_depthwise=True,
    ),
    bbox_head=dict(
        type="SSDHead",
        in_channels=(96, 1280, 512, 256, 256, 128),
        num_classes=80,
        use_depthwise=True,
        anchor_generator=dict(
            type="SSDAnchorGenerator",
            scale_major=False,
            strides=[16, 32, 64, 107, 160, 320],
            ratios=[[2, 3], [2, 3], [2, 3], [2, 3], [2, 3], [2, 3]],
            min_sizes=[48, 100, 150, 202, 253, 304],
            max_sizes=[100, 150, 202, 253, 304, 320],
        ),
        bbox_coder=dict(
            type="DeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2],
        ),
    ),
    train_cfg=dict(
        assigner=dict(
            type="MaxIoUAssigner",
            pos_iou_thr=0.5,
            neg_iou_thr=0.5,
            min_pos_iou=0.0,
        ),
        smoothl1_beta=1.0,
        neg_pos_ratio=3,
    ),
    test_cfg=dict(
        nms_pre=1000,
        score_thr=0.02,
        nms=dict(type="nms", iou_threshold=0.45),
        max_per_img=200,
    ),
)
data = dict(
    samples_per_gpu=24,
    train=dict(pipeline=dict(canvas=(320, 320), ssd_aug=True)),
    val=dict(pipeline=dict(canvas=(320, 320))),
    test=dict(pipeline=dict(canvas=(320, 320))),
)
optimizer = dict(type="sgd", lr=0.015, momentum=0.9, weight_decay=4e-5)
lr_config = dict(
    policy="cosine", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
)
runner = dict(type="EpochBasedRunner", max_epochs=600)
