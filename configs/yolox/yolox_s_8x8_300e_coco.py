# YOLOX-s (reference configs/yolox values; mosaic/mixup aug pipeline is a
# round-2 item -- standard resize/flip pipeline here).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

model = dict(
    type="YOLOX",
    backbone=dict(type="CSPDarknet", deepen_factor=0.33, widen_factor=0.5),
    neck=dict(
        type="YOLOXPAFPN",
        in_channels=[128, 256, 512],
        out_channels=128,
        num_csp_blocks=1,
    ),
    bbox_head=dict(
        type="YOLOXHead", num_classes=80, in_channels=128, feat_channels=128,
    ),
    train_cfg=dict(assigner=dict(type="SimOTAAssigner", center_radius=2.5)),
    test_cfg=dict(
        score_thr=0.01, nms=dict(type="nms", iou_threshold=0.65),
        max_per_img=100,
    ),
)
optimizer = dict(lr=0.01, weight_decay=5e-4)
