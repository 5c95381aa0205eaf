# SSD300 COCO (reference configs/ssd/ssd300_coco.py values).
_base_ = [
    "../_base_/models/ssd300.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
data = dict(
    samples_per_gpu=8,
    train=dict(pipeline=dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))),
    val=dict(pipeline=dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))),
    test=dict(pipeline=dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))),
)
optimizer = dict(lr=0.002)
