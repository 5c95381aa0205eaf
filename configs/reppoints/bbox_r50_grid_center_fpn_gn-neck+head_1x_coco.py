# Reference configs/reppoints/bbox_r50_grid_center_fpn_gn-neck+head_1x_coco
# (grid points + center-region init assigner).
_base_ = "./bbox_r50_grid_fpn_gn-neck+head_1x_coco.py"
model = dict(
    train_cfg=dict(
        init=dict(
            assigner=dict(
                _delete_=True,
                type="PointAssigner",
                scale=4,
                pos_num=1,
            ),
        ),
    ),
)
