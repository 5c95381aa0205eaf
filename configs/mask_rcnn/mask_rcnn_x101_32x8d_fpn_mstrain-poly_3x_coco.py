# Reference configs/mask_rcnn/mask_rcnn_x101_32x8d_fpn_mstrain-poly_3x_coco.
_base_ = "./mask_rcnn_x101_32x8d_fpn_mstrain-poly_1x_coco.py"
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
