# Reference configs/vfnet/vfnet_r50_fpn_mstrain_2x_coco.
_base_ = "./vfnet_r50_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
