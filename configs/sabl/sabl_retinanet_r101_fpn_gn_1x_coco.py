# Reference configs/sabl/sabl_retinanet_r101_fpn_gn_1x_coco.
_base_ = "./sabl_retinanet_r101_fpn_1x_coco.py"
model = dict(bbox_head=dict(norm_cfg=dict(
    type="GN", num_groups=32, requires_grad=True)))
