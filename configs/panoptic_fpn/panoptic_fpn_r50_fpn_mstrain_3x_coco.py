# Reference configs/panoptic_fpn/panoptic_fpn_r50_fpn_mstrain_3x_coco.
_base_ = "./panoptic_fpn_r50_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
