# Faster R-CNN R50 with a PAFPN neck (reference
# configs/pafpn/faster_rcnn_r50_pafpn_1x_coco.py: FPN -> PAFPN swap only).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    neck=dict(
        type="PAFPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
    )
)
