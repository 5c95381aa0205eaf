# Reference configs/swin/mask_rcnn_swin-s-p4-w7_fpn_ms-crop-3x_coco.
_base_ = "./mask_rcnn_swin-t-p4-w7_fpn_ms-crop-3x_coco.py"
model = dict(backbone=dict(depths=(2, 2, 18, 2)))
