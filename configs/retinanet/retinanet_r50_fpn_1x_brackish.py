# Reference configs/retinanet/retinanet_r50_fpn_1x_brackish (fork underwater).
_base_ = [
    "./retinanet_r50_fpn_1x_coco.py",
    "../_base_/datasets/brackish_detection.py",
]
model = dict(bbox_head=dict(num_classes=6))
