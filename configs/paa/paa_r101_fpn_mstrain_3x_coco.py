# Reference configs/paa/paa_r101_fpn_mstrain_3x_coco.
_base_ = "./paa_r50_fpn_mstrain_3x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
