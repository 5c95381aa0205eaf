# GCNet: Mask R-CNN R50-FPN + ContextBlock (ratio 1/4) after conv3 of
# stages c3-c5 (reference configs/gcnet/mask_rcnn_r50_fpn_r4_gcb_c3-c5_
# 1x_coco.py; plugin semantics mmdet/models/backbones/resnet.py:121-140).
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(plugins=[
        dict(
            cfg=dict(type="ContextBlock", ratio=1.0 / 4),
            stages=(False, True, True, True),
            position="after_conv3",
        )
    ])
)
