# Reference configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_mstrain_1x_coco.
_base_ = "./faster_rcnn_r50_caffe_dc5_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
