# Mask R-CNN R50-FPN 1x COCO (reference configs/mask_rcnn/
# mask_rcnn_r50_fpn_1x_coco.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
optimizer = dict(lr=0.02)
