# Reference configs/mask_rcnn/mask_rcnn_r101_fpn_2x_coco.
_base_ = "./mask_rcnn_r50_fpn_2x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
