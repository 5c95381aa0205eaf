# Reference configs/ld/ld_r34_gflv1_r101_fpn_coco_1x.
_base_ = "./ld_r18_gflv1_r101_fpn_coco_1x.py"
model = dict(
    backbone=dict(
        depth=34,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet34"),
    ),
    neck=dict(in_channels=[64, 128, 256, 512]),
)
