# Reference configs/dcn/mask_rcnn_r50_fpn_mdconv_c3-c5_1x_coco.
_base_ = "./mask_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py"
model = dict(
    backbone=dict(
        dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
    )
)
