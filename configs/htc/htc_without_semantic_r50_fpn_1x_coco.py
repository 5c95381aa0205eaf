# Hybrid Task Cascade without semantic branch (reference
# configs/htc/htc_without_semantic_r50_fpn_1x_coco.py): cascade bbox heads
# + per-stage HTCMaskHead with mask information flow, interleaved training.
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]

_mask_head = dict(
    type="HTCMaskHead",
    with_conv_res=True,
    num_convs=4,
    in_channels=256,
    conv_out_channels=256,
    num_classes=80,
    loss_mask=dict(type="CrossEntropyLoss", use_mask=True, loss_weight=1.0),
)

model = dict(
    type="HybridTaskCascade",
    roi_head=dict(
        type="HybridTaskCascadeRoIHead",
        interleaved=True,
        mask_info_flow=True,
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
        mask_head=[_mask_head, _mask_head, _mask_head],
    ),
)
