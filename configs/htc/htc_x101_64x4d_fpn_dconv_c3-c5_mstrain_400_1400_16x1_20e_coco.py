# Reference configs/htc/htc_x101_64x4d_fpn_dconv_c3-c5_mstrain_400_1400_16x1_20e_coco.
_base_ = "./htc_x101_64x4d_fpn_16x1_20e_coco.py"
model = dict(backbone=dict(
    dcn=dict(type="DCN", deform_groups=1, fallback_on_stride=False),
    stage_with_dcn=(False, True, True, True)))
data = dict(train=dict(pipeline=dict(mstrain_range=(400, 1400))))
