# Multi-scale 3x COCO instance recipe (reference configs/common/
# mstrain_3x_coco_instance.py): detection recipe + mask targets.
_base_ = "./mstrain_3x_coco.py"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, mstrain_range=(640, 800),
    with_masks=True,
)
data = dict(train=dict(pipeline=train_pipeline))
evaluation = dict(interval=1, metric=["bbox", "segm"])
