# COCO 2017 instance segmentation (reference _base_/datasets/
# coco_instance.py): detection base + mask targets in the loader.
_base_ = "./coco_detection.py"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
)
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric=["bbox", "segm"])
