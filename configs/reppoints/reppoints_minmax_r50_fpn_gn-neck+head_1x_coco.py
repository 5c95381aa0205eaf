# Reference configs/reppoints/reppoints_minmax_r50_fpn_gn-neck+head_1x_coco.
_base_ = "./reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py"
model = dict(bbox_head=dict(transform_method="minmax"))
