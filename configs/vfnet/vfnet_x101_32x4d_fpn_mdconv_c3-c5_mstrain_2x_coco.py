# Reference configs/vfnet/vfnet_x101_32x4d_fpn_mdconv_c3-c5_mstrain_2x_coco.
_base_ = "./vfnet_x101_32x4d_fpn_mstrain_2x_coco.py"
model = dict(backbone=dict(
    dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
    stage_with_dcn=(False, True, True, True)))
