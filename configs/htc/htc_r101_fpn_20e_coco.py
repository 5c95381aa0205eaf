# Reference configs/htc/htc_r101_fpn_20e_coco.
_base_ = "./htc_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
