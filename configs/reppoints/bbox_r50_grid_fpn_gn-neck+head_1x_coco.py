# Reference configs/reppoints/bbox_r50_grid_fpn_gn-neck+head_1x_coco
# (bbox-style RepPoints: grid-from-regression points, minmax transform).
_base_ = "./reppoints_moment_r50_fpn_gn-neck+head_1x_coco.py"
model = dict(
    bbox_head=dict(transform_method="minmax", use_grid_points=True)
)
