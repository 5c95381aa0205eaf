# Reference configs/vfnet/vfnet_r101_fpn_mdconv_c3-c5_mstrain_2x_coco.
_base_ = "./vfnet_r50_fpn_mdconv_c3-c5_mstrain_2x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
