# Mask R-CNN R50-FPN on Cityscapes (reference configs/cityscapes/
# mask_rcnn_r50_fpn_1x_cityscapes.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/cityscapes_instance.py",
    "../_base_/default_runtime.py",
]
model = dict(
    backbone=dict(init_cfg=None),
    roi_head=dict(
        bbox_head=dict(num_classes=8),
        mask_head=dict(num_classes=8),
    ),
)
optimizer = dict(type="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[7],
)
runner = dict(type="EpochBasedRunner", max_epochs=8)
