# Reference configs/fast_rcnn/fast_rcnn_r101_fpn_2x_coco.
_base_ = "./fast_rcnn_r50_fpn_2x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
