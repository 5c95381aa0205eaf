# Reference configs/detectors/detectors_cascade_rcnn_r50_1x_trashcanins (fork underwater instance dataset).
_base_ = [
    "./detectors_cascade_rcnn_r50_1x_coco.py",
    "../_base_/datasets/trashcan_instance.py",
]
model = dict(roi_head=dict(bbox_head=[
    dict(num_classes=22), dict(num_classes=22), dict(num_classes=22),
]))
