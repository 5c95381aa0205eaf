# Mask R-CNN R50-FPN on LVIS v0.5 (reference configs/lvis/
# mask_rcnn_r50_fpn_sample1e-3_mstrain_2x_lvis_v0.5.py: 1230 classes, 2x).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v0.5_instance.py",
    "../_base_/default_runtime.py",
]
model = dict(
    roi_head=dict(
        bbox_head=dict(num_classes=1230),
        mask_head=dict(num_classes=1230),
    ),
    test_cfg=dict(rcnn=dict(score_thr=0.0001, max_per_img=300)),
)
optimizer = dict(type="sgd", lr=0.02, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=300, with_masks=True,
    mstrain_range=(640, 800),
)
data = dict(train=dict(dataset=dict(pipeline=train_pipeline)))
