# Reference configs/regnet/mask_rcnn_regnetx-12GF_fpn_1x_coco.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="RegNet",
        arch="regnetx_12gf",
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://regnetx_12gf"
        ),
    ),
    neck=dict(in_channels=[224, 448, 896, 2240]),
)
