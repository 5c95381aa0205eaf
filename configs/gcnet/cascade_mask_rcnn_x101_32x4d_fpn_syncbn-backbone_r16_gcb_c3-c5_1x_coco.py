# Reference configs/gcnet/cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_r16_gcb_c3-c5_1x_coco.
_base_ = "./cascade_mask_rcnn_x101_32x4d_fpn_syncbn-backbone_1x_coco.py"
model = dict(
    backbone=dict(plugins=[
        dict(
            cfg=dict(type="ContextBlock", ratio=1.0 / 16),
            stages=(False, True, True, True),
            position="after_conv3",
        )
    ])
)
