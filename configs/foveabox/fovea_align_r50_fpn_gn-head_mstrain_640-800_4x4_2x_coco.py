# Reference configs/foveabox/fovea_align_r50_fpn_gn-head_mstrain_640-800_4x4_2x_coco.
_base_ = "./fovea_align_r50_fpn_gn-head_4x4_2x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
