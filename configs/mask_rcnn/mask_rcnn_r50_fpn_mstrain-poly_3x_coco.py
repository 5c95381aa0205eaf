# Reference configs/mask_rcnn/mask_rcnn_r50_fpn_mstrain-poly_3x_coco.
_base_ = [
    "../common/mstrain-poly_3x_coco_instance.py",
    "../_base_/models/mask_rcnn_r50_fpn.py",
]
