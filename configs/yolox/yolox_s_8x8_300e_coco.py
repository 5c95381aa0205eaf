# YOLOX-s (reference configs/yolox/yolox_s_8x8_300e_coco.py: CSPDarknet +
# PAFPN + decoupled head, SimOTA, mosaic + mixup train recipe, live BN).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

data = dict(
    train=dict(
        pipeline=dict(
            canvas=(640, 640),
            mosaic_prob=1.0,  # reference Mosaic is unconditional
            mixup_prob=0.5,
            flip_prob=0.5,
        ),
    ),
)

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

# Reference training recipe (configs/yolox/yolox_s_8x8_300e_coco.py:100-140):
# quadratic-exp warmup + cosine anneal with a fixed floor over the final
# mosaic-free epochs, mode-switch + exp-momentum EMA hooks.
optimizer = dict(
    lr=0.01, momentum=0.9, weight_decay=5e-4, nesterov=True,
)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    _delete_=True,
    policy="YOLOX",
    warmup="exp",
    by_epoch=False,
    warmup_by_epoch=True,
    warmup_ratio=1,
    warmup_iters=5,  # epochs
    num_last_epochs=15,
    min_lr_ratio=0.05,
)
runner = dict(type="EpochBasedRunner", max_epochs=300)
custom_hooks = [
    dict(type="YOLOXModeSwitchHook", num_last_epochs=15, priority=48),
    dict(type="SyncRandomSizeHook", ratio_range=(14, 26), priority=48),
    dict(type="SyncNormHook", num_last_epochs=15, interval=10, priority=48),
    dict(type="ExpMomentumEMAHook", priority=49),
]
