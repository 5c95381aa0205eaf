# Faster R-CNN R50 with the Feature Pyramid Transformer neck — the FORK's
# addition (reference mmdet/models/necks/fpt/* imported by the
# Boosting-R-CNN fork; see models/necks/fpt.py docstring for the upstream
# bugs repaired in this rebuild).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    neck=dict(
        type="FPT",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        fpt_rendering=True,
    )
)
