# Reference configs/solo/decoupled_solo_r50_fpn_3x_coco.
_base_ = "./decoupled_solo_r50_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(352, 512))))
lr_config = dict(step=[27, 33])
runner = dict(max_epochs=36)
