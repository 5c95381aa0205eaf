# Cascade R-CNN R50-FPN 1x COCO (reference configs/_base_/models/
# cascade_rcnn_r50_fpn.py values: 3 stages, rising IoU thresholds).
_base_ = [
    "../_base_/models/cascade_rcnn_r50_fpn.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
optimizer = dict(lr=0.02)
