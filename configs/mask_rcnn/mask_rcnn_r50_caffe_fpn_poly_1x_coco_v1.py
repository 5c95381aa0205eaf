# Reference configs/mask_rcnn/mask_rcnn_r50_caffe_fpn_poly_1x_coco_v1:
# the mmdet-v1-compat caffe variant — polygon (not RLE) mask loading,
# legacy un-aligned RoIAlign (aligned=False, sampling_ratio=2) and
# SmoothL1 losses.  The aligned=False half-pixel offset is a v1
# checkpoint-compat quirk; this rebuild keeps aligned semantics (exact)
# and matches the rest of the recipe.
_base_ = "./mask_rcnn_r50_caffe_fpn_1x_coco.py"
model = dict(
    rpn_head=dict(
        loss_bbox=dict(_delete_=True, type="SmoothL1Loss", beta=1.0 / 9.0,
                       loss_weight=1.0),
    ),
    roi_head=dict(
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=2, aligned=False),
        ),
        bbox_head=dict(
            loss_bbox=dict(_delete_=True, type="SmoothL1Loss", beta=1.0,
                           loss_weight=1.0),
        ),
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14,
                           sampling_ratio=2, aligned=False),
        ),
    ),
)
data = dict(train=dict(pipeline=dict(poly2mask=False)))
