# Mixed-precision Mask R-CNN + DCNv1 c3-c5 (reference configs/fp16/
# mask_rcnn_r50_fpn_fp16_dconv_c3-c5_1x_coco.py); bf16 compute on TPU.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        dcn=dict(type="DCN", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
    )
)
compute_dtype = "bfloat16"
fp16 = dict(loss_scale=512.0)
