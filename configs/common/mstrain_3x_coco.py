# Multi-scale 3x COCO detection recipe (reference configs/common/
# mstrain_3x_coco.py: short side [640, 800], 36 epochs, step [28, 34]
# with the reference's noted [9,11]-per-12 ratio -> [28, 34]).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
]
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, mstrain_range=(640, 800),
)
data = dict(train=dict(pipeline=train_pipeline))
optimizer = dict(type="sgd", lr=0.02, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[28, 34],
)
runner = dict(type="EpochBasedRunner", max_epochs=36)
