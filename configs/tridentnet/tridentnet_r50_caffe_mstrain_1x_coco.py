# Reference configs/tridentnet/tridentnet_r50_caffe_mstrain_1x_coco.
_base_ = "./tridentnet_r50_caffe_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
