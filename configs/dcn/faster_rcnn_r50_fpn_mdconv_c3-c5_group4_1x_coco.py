# Reference configs/dcn/faster_rcnn_r50_fpn_mdconv_c3-c5_group4_1x_coco.
_base_ = "./faster_rcnn_r50_fpn_dconv_c3-c5_1x_coco.py"
model = dict(
    backbone=dict(
        dcn=dict(type="DCNv2", deform_groups=4, fallback_on_stride=False)
    )
)
