# Reference configs/faster_rcnn/faster_rcnn_r50_fpn_2x_coco.
_base_ = "./faster_rcnn_r50_fpn_1x_coco.py"
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
