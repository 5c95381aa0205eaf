# Reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco
# (CascadeRoIHead + per-stage FCN mask heads — no interleave/info-flow,
# unlike HTC).
_base_ = [
    "../_base_/models/cascade_mask_rcnn_r50_fpn.py",
    "../_base_/datasets/coco_instance.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
