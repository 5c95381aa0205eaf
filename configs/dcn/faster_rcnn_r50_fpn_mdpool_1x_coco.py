# Reference configs/dcn/faster_rcnn_r50_fpn_mdpool_1x_coco (modulated
# deformable RoI pooling: offsets + a sigmoid per-bin mask).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    roi_head=dict(
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(
                type="ModulatedDeformRoIPoolPack",
                output_size=7,
                output_channels=256,
            ),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
    ),
)
