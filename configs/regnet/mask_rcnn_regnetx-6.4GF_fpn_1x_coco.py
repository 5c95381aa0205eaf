# Reference configs/regnet/mask_rcnn_regnetx-6.4GF_fpn_1x_coco.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="RegNet",
        arch="regnetx_6.4gf",
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://regnetx_6.4gf"
        ),
    ),
    neck=dict(in_channels=[168, 392, 784, 1624]),
)
