# Reference configs/retinanet/retinanet_r101_fpn_1x_coco.
_base_ = "./retinanet_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
