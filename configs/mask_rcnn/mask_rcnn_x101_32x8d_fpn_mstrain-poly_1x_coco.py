# Reference configs/mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_1x_coco.
_base_ = "./mask_rcnn_x101_32x8d_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
