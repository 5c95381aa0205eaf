# Reference configs/pvt/retinanet_pvtv2-b5_fpn_1x_coco.
_base_ = "./retinanet_pvtv2-b2_fpn_1x_coco.py"
model = dict(backbone=dict(num_layers=[3, 6, 40, 3]))
