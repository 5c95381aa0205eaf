# Reference configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_mstrain_1x_coco.
_base_ = "./mask_rcnn_r50_caffe_fpn_mstrain-poly_1x_coco.py"
