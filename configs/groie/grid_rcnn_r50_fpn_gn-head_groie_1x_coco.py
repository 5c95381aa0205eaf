# Reference configs/groie/grid_rcnn_r50_fpn_gn-head_groie_1x_coco.
_base_ = "../grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py"
model = dict(
    roi_head=dict(
        bbox_roi_extractor=dict(
            type="GenericRoIExtractor",
            aggregation="sum",
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=2),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
    ),
)
