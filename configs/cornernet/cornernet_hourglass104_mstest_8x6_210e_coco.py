# CornerNet HourglassNet-104 (reference
# configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

model = dict(
    type="CornerNet",
    backbone=dict(
        type="HourglassNet",
        downsample_times=5,
        num_stacks=2,
        stage_channels=[256, 256, 384, 384, 384, 512],
        stage_blocks=[2, 2, 2, 2, 2, 4],
        feat_channel=256,
    ),
    neck=None,
    bbox_head=dict(
        type="CornerHead",
        num_classes=80,
        in_channels=256,
        num_feat_levels=2,
        corner_emb_channels=1,
        loss_heatmap=dict(
            type="GaussianFocalLoss", alpha=2.0, gamma=4.0, loss_weight=1
        ),
        loss_embedding=dict(
            type="AssociativeEmbeddingLoss", pull_weight=0.1, push_weight=0.1
        ),
        loss_offset=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1),
    ),
    test_cfg=dict(
        corner_topk=100,
        local_maximum_kernel=3,
        distance_threshold=0.5,
        score_thr=0.05,
        max_per_img=100,
        nms=dict(type="soft_nms", iou_threshold=0.5, method="gaussian"),
    ),
)
optimizer = dict(type="Adam", lr=0.0005)
