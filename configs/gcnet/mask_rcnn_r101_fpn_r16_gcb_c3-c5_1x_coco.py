# Reference configs/gcnet/mask_rcnn_r101_fpn_r16_gcb_c3-c5_1x_coco.
_base_ = "./mask_rcnn_r50_fpn_r16_gcb_c3-c5_1x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
