# SSD300 on PASCAL VOC 07+12 (reference configs/pascal_voc/ssd300_voc0712.py:
# 20 classes, basesize_ratio_range (0.2, 0.9), SSD aug pipeline, 24 epochs).
_base_ = [
    "../_base_/models/ssd300.py",
    "../_base_/datasets/voc0712.py",
    "../_base_/default_runtime.py",
]
model = dict(
    bbox_head=dict(
        num_classes=20,
        anchor_generator=dict(basesize_ratio_range=(0.2, 0.9)),
    )
)
train_pipeline = dict(
    scale=(300, 300), keep_ratio=False, flip_prob=0.5,
    canvas=(300, 300), max_gt=100,
    ssd_aug=True,
)
data = dict(
    samples_per_gpu=8,
    train=dict(pipeline=train_pipeline),
)
optimizer = dict(type="sgd", lr=1e-3, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict()
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 20],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
