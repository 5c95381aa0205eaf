# Reference configs/detectors/detectors_htc_r101_20e_coco.
_base_ = "./detectors_htc_r50_1x_coco.py"
model = dict(
    backbone=dict(depth=101),
    neck=dict(rfp_backbone=dict(depth=101)),
)
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
