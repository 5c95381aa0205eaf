# Faster R-CNN with the fork's SPPFPN neck (reference configs/faster_rcnn/
# faster_rcnn_r50_sppfpn_1x_coco.py: shared-weight ASPP laterals).
_base_ = "./faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        type="SPPFPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        SPP_type="ASPP_share",
    )
)
