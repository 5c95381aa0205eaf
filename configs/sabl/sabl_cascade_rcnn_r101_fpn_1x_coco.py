# Reference configs/sabl/sabl_cascade_rcnn_r101_fpn_1x_coco.
_base_ = "./sabl_cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
