# Reference configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_1x_coco.
_base_ = "./grid_rcnn_r50_fpn_gn-head_2x_coco.py"
lr_config = dict(step=[8, 11])
runner = dict(max_epochs=12)
