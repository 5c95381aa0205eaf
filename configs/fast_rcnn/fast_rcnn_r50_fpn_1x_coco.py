# Fast R-CNN R50-FPN 1x COCO (reference
# configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py): the two-stage detector
# in external-proposal mode — no RPN; proposals are provided by the data
# pipeline (``proposal_file`` in the reference, ``batch["proposals"]``
# here; see ``models/detectors/two_stage.py`` FastRCNN mode).
_base_ = [
    "../_base_/models/fast_rcnn_r50_fpn.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
optimizer = dict(lr=0.02)
