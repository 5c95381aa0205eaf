# Reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco (CascadeRoIHead + per-stage FCN mask heads — no interleave/info-flow, unlike HTC).
_base_ = "./cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    roi_head=dict(
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
        mask_head=dict(
            type="FCNMaskHead",
            num_convs=4,
            in_channels=256,
            conv_out_channels=256,
            num_classes=80,
            loss_mask=dict(
                type="CrossEntropyLoss", use_mask=True, loss_weight=1.0
            ),
        ),
    ),
)
data = dict(train=dict(pipeline=dict(with_masks=True)))
evaluation = dict(metric=["bbox", "segm"])
