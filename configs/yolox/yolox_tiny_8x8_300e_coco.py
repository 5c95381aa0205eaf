# Reference configs/yolox/yolox_tiny_8x8_300e_coco.
_base_ = "./yolox_s_8x8_300e_coco.py"
model = dict(
    backbone=dict(deepen_factor=0.33, widen_factor=0.375),
    neck=dict(
        in_channels=[96, 192, 384], out_channels=96,
    ),
    bbox_head=dict(in_channels=96, feat_channels=96),
)
data = dict(
    train=dict(pipeline=dict(canvas=(416, 416))),
    val=dict(pipeline=dict(canvas=(416, 416))),
    test=dict(pipeline=dict(canvas=(416, 416))),
)
