# Reference configs/foveabox/fovea_align_r101_fpn_gn-head_4x4_2x_coco.
_base_ = "./fovea_align_r50_fpn_gn-head_4x4_2x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
