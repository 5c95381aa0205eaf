# Reference configs/gn+ws/mask_rcnn_r101_fpn_gn_ws-all_2x_coco.
_base_ = "./mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
