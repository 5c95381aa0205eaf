# Reference configs/ms_rcnn/ms_rcnn_r101_caffe_fpn_2x_coco.
_base_ = "./ms_rcnn_r101_caffe_fpn_1x_coco.py"
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
