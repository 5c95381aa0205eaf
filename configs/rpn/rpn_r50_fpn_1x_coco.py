# RPN-only (reference configs/rpn values): proposal-quality training/eval.
_base_ = [
    "../_base_/models/rpn_r50_fpn.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
evaluation = dict(metric="proposal_fast")
