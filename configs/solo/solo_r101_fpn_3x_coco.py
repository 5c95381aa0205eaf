# Reference configs/solo/solo_r101_fpn_3x_coco.
_base_ = "./solo_r50_fpn_3x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
