# Reference configs/faster_rcnn/faster_rcnn_r50_fpn_1x_brackish (fork
# contribution: Brackish underwater dataset, 6 classes).
_base_ = [
    "../_base_/models/faster_rcnn_r50_fpn.py",
    "../_base_/datasets/brackish_detection.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=6)))
