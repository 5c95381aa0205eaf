# Reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e_coco.
_base_ = "./cascade_mask_rcnn_r50_fpn_1x_coco.py"
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
