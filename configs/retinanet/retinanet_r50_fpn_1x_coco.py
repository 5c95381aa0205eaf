# RetinaNet R50-FPN 1x COCO (reference configs/_base_/models/retinanet_r50_fpn.py).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
optimizer = dict(lr=0.01)
