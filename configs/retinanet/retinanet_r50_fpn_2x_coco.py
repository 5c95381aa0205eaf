# Reference configs/retinanet/retinanet_r50_fpn_2x_coco.
_base_ = "./retinanet_r50_fpn_1x_coco.py"
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
