# SSD300 COCO (reference configs/ssd/ssd300_coco.py: SSD aug chain
# PhotoMetric/Expand/MinIoUCrop, lr 2e-3, 24 epochs, step [16, 22]).
_base_ = [
    "../_base_/models/ssd300.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
]
data = dict(
    samples_per_gpu=8,
    train=dict(pipeline=dict(scale=(300, 300), keep_ratio=False,
                             canvas=(300, 300), ssd_aug=True)),
    val=dict(pipeline=dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))),
    test=dict(pipeline=dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))),
)
optimizer = dict(type="sgd", lr=0.002, momentum=0.9, weight_decay=5e-4)
optimizer_config = dict()
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
