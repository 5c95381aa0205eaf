# Reference configs/pvt/retinanet_pvtv2-b4_fpn_1x_coco.
_base_ = "./retinanet_pvtv2-b2_fpn_1x_coco.py"
model = dict(backbone=dict(num_layers=[3, 8, 27, 3]))
