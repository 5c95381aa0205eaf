# SSD300 on WIDER-Face (reference configs/wider_face/ssd300_wider_face.py:
# 1 class, basesize_ratio_range (0.15, 0.9), lr 0.012, 24 epochs
# [16, 20]).
_base_ = [
    "../_base_/models/ssd300.py",
    "../_base_/datasets/wider_face.py",
    "../_base_/default_runtime.py",
]
model = dict(
    bbox_head=dict(
        num_classes=1,
        anchor_generator=dict(basesize_ratio_range=(0.15, 0.9)),
    )
)
train_pipeline = dict(
    scale=(300, 300), keep_ratio=False, flip_prob=0.5,
    canvas=(300, 300), max_gt=600, ssd_aug=True,
)
data = dict(samples_per_gpu=8, train=dict(pipeline=train_pipeline))
optimizer = dict(type="sgd", lr=0.012, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict()
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=1000, warmup_ratio=0.001,
    step=[16, 20],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
