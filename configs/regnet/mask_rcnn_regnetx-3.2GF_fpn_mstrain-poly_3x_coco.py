# Reference configs/regnet/mask_rcnn_regnetx-3.2GF_fpn_mstrain-poly_3x_coco.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_mstrain-poly_3x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="RegNet",
        arch="regnetx_3.2gf",
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://regnetx_3.2gf",
        ),
    ),
    neck=dict(in_channels=[96, 192, 432, 1008]),
)
