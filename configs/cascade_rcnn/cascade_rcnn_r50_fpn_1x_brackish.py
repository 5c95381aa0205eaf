# Reference configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_brackish (fork underwater).
_base_ = [
    "./cascade_rcnn_r50_fpn_1x_coco.py",
    "../_base_/datasets/brackish_detection.py",
]
model = dict(roi_head=dict(bbox_head=[
    dict(num_classes=6), dict(num_classes=6), dict(num_classes=6),
]))
