# SSD300-VGG16 model (reference configs/_base_/models/ssd300.py).
model = dict(
    type="SSD",
    backbone=dict(type="SSDVGG", input_size=300, depth=16),
    bbox_head=dict(
        type="SSDHead",
        num_classes=80,
        anchor_generator=dict(
            type="SSDAnchorGenerator",
            input_size=300,
            strides=[8, 16, 32, 64, 100, 300],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
            basesize_ratio_range=(0.15, 0.9),
        ),
        bbox_coder=dict(
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[0.1, 0.1, 0.2, 0.2],
        ),
    ),
    train_cfg=dict(
        assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0),
        neg_pos_ratio=3,
        allowed_border=-1,
        pos_weight=-1,
    ),
    test_cfg=dict(
        nms_pre=1000,
        min_bbox_size=0,
        score_thr=0.02,
        nms=dict(iou_threshold=0.45),
        max_per_img=200,
    ),
)
