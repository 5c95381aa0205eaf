# Reference configs/fcos/fcos_r101_caffe_fpn_gn-head_mstrain_640-800_2x_coco.
_base_ = "./fcos_r101_caffe_fpn_gn-head_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
