# Faster R-CNN R50 with GRoIE (reference
# configs/groie/faster_rcnn_r50_fpn_groie_1x_coco.py: GenericRoIExtractor
# aggregating ALL pyramid levels with sum + post-processing conv).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    roi_head=dict(
        bbox_roi_extractor=dict(
            type="GenericRoIExtractor",
            aggregation="sum",
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        )
    )
)
