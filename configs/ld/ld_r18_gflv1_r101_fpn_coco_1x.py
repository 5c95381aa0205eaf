# Localization Distillation: R18 GFL student distilled from an R101 GFL
# teacher (reference configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py).  The
# teacher is built from ``teacher_config``; its weights are loaded with
# ``detector.set_teacher_variables`` at train time (released teacher
# checkpoints are Drive links, unavailable offline).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

teacher_cfg = "configs/gfl/gfl_r50_fpn_1x_coco.py"

model = dict(
    type="KnowledgeDistillationSingleStageDetector",
    teacher_config=teacher_cfg,
    backbone=dict(
        type="ResNet",
        depth=18,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet18"),
    ),
    neck=dict(
        type="FPN",
        in_channels=[64, 128, 256, 512],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_output",
        num_outs=5,
    ),
    bbox_head=dict(
        type="LDHead",
        num_classes=80,
        in_channels=256,
        stacked_convs=4,
        feat_channels=256,
        reg_max=16,
        anchor_generator=dict(
            type="AnchorGenerator",
            ratios=[1.0],
            octave_base_scale=8,
            scales_per_octave=1,
            strides=[8, 16, 32, 64, 128],
        ),
        loss_cls=dict(
            type="QualityFocalLoss", use_sigmoid=True, beta=2.0, loss_weight=1.0
        ),
        loss_dfl=dict(type="DistributionFocalLoss", loss_weight=0.25),
        loss_ld=dict(
            type="LocalizationDistillationLoss", loss_weight=0.25, T=10
        ),
        loss_bbox=dict(type="GIoULoss", loss_weight=2.0),
    ),
    train_cfg=dict(
        assigner=dict(type="ATSSAssigner", topk=9),
        allowed_border=-1,
        pos_weight=-1,
    ),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.05,
        nms=dict(iou_threshold=0.6),
        max_per_img=100,
    ),
)
optimizer = dict(lr=0.01)
