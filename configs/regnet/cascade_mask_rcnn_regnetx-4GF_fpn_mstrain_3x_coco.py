# Reference configs/regnet/cascade_mask_rcnn_regnetx-4GF_fpn_mstrain_3x_coco.
_base_ = "../cascade_rcnn/cascade_mask_rcnn_r50_fpn_mstrain_3x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="RegNet",
        arch="regnetx_4.0gf",
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://regnetx_4.0gf",
        ),
    ),
    neck=dict(in_channels=[80, 240, 560, 1360]),
)
