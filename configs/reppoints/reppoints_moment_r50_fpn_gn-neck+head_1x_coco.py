# Reference configs/reppoints/reppoints_moment_r50_fpn_gn-neck+head_1x_coco.
_base_ = "./reppoints_moment_r50_fpn_1x_coco.py"
norm_cfg = dict(type="GN", num_groups=32, requires_grad=True)
model = dict(neck=dict(norm_cfg=norm_cfg), bbox_head=dict(norm_cfg=norm_cfg))
