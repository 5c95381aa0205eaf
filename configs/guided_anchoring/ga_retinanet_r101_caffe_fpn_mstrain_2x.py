# Reference configs/guided_anchoring/ga_retinanet_r101_caffe_fpn_mstrain_2x.
_base_ = "./ga_retinanet_r101_caffe_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
