# Reference configs/empirical_attention/faster_rcnn_r50_fpn_attention_1111_dcn_1x_coco.
_base_ = "./faster_rcnn_r50_fpn_attention_1111_1x_coco.py"
model = dict(
    backbone=dict(
        dcn=dict(type="DCN", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
    )
)
