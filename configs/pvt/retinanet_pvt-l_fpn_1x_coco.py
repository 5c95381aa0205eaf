# Reference configs/pvt/retinanet_pvt-l_fpn_1x_coco.
_base_ = "./retinanet_pvt-t_fpn_1x_coco.py"
model = dict(backbone=dict(num_layers=[3, 8, 27, 3]))
