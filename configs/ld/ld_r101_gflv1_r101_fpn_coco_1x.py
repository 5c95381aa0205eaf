# Reference configs/ld/ld_r101_gflv1_r101_fpn_coco_1x.
_base_ = "./ld_r18_gflv1_r101_fpn_coco_1x.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet101"),
    ),
    neck=dict(in_channels=[256, 512, 1024, 2048]),
)
