# mstrain-2x variant (reference ..._mocov2-pretrain_ms-2x_coco.py).
_base_ = "./mask_rcnn_r50_fpn_mocov2-pretrain_1x_coco.py"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    mstrain_range=(640, 800),
)
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[16, 22])
runner = dict(type="EpochBasedRunner", max_epochs=24)
