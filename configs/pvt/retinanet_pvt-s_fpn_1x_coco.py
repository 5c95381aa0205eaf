# Reference configs/pvt/retinanet_pvt-s_fpn_1x_coco.
_base_ = "./retinanet_pvt-t_fpn_1x_coco.py"
model = dict(backbone=dict(num_layers=[3, 4, 6, 3]))
