# Reference configs/faster_rcnn/faster_rcnn_r50_fpn_mstrain_3x_coco.
_base_ = [
    "../common/mstrain_3x_coco.py",
    "../_base_/models/faster_rcnn_r50_fpn.py",
]
