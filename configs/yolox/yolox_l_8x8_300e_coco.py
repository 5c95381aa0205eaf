# Reference configs/yolox/yolox_l_8x8_300e_coco.
_base_ = "./yolox_s_8x8_300e_coco.py"
model = dict(
    backbone=dict(deepen_factor=1.0, widen_factor=1.0),
    neck=dict(in_channels=[256, 512, 1024], out_channels=256),
    bbox_head=dict(in_channels=256, feat_channels=256),
)
