# Reference configs/gfl/gfl_x101_32x4d_fpn_dconv_c4-c5_mstrain_2x_coco.
_base_ = "./gfl_x101_32x4d_fpn_mstrain_2x_coco.py"
model = dict(backbone=dict(
    dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
    stage_with_dcn=(False, False, True, True)))
