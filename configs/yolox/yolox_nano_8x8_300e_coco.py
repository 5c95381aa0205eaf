# Reference configs/yolox/yolox_nano_8x8_300e_coco.
_base_ = "./yolox_tiny_8x8_300e_coco.py"
model = dict(
    backbone=dict(deepen_factor=0.33, widen_factor=0.25),
    neck=dict(in_channels=[64, 128, 256], out_channels=64),
    bbox_head=dict(in_channels=64, feat_channels=64),
)
