# Reference configs/dcn/faster_rcnn_r50_fpn_dpool_1x_coco (deformable RoI
# pooling: learned per-bin sample offsets in the RoI extractor).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    roi_head=dict(
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(
                type="DeformRoIPoolPack",
                output_size=7,
                output_channels=256,
            ),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
    ),
)
