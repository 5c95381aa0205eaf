# Panoptic FPN R50 1x COCO (reference
# configs/panoptic_fpn/panoptic_fpn_r50_fpn_1x_coco.py): Mask R-CNN +
# summed conv-upsample semantic head + heuristic fusion.
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    type="PanopticFPN",
    semantic_head=dict(
        type="PanopticFPNHead",
        num_things_classes=80,
        num_stuff_classes=53,
        in_channels=256,
        inner_channels=128,
        start_level=0,
        end_level=4,
        loss_seg=dict(
            type="CrossEntropyLoss", ignore_index=255, loss_weight=0.5
        ),
    ),
    panoptic_fusion_head=dict(
        type="HeuristicFusionHead",
        num_things_classes=80,
        num_stuff_classes=53,
    ),
    test_cfg=dict(
        panoptic=dict(
            score_thr=0.6,
            max_per_img=100,
            mask_thr_binary=0.5,
            mask_overlap=0.5,
            nms=dict(type="nms", iou_threshold=0.5, class_agnostic=True),
            stuff_area_limit=4096,
        ),
    ),
)
