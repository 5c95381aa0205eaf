# Cityscapes instance segmentation (reference _base_/datasets/
# cityscapes_instance.py).
_base_ = "./cityscapes_detection.py"
train_pipeline = dict(
    scale=(2048, 1024), keep_ratio=True, flip_prob=0.5,
    canvas=(1024, 2048), max_gt=100, mstrain_range=(800, 1024),
    with_masks=True,
)
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric=["bbox", "segm"])
