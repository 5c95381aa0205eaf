# Boosting R-CNN R50-FPN 1x COCO — deltas from the UTDAC config per the
# reference (configs/boosting_rcnn/boosting_rcnn_r50_fpn_1x_coco.py):
# FPN on_input, encoded-delta regression (reg_decoded_bbox=False), gamma=2,
# CIoULoss box (applied on delta vectors, reference loss_single else-branch),
# MSE aug loss weight 2, 80 classes.
_base_ = ["./boosting_rcnn_r50_pafpn_1x_utdac.py", "../_base_/datasets/coco_detection.py"]

model = dict(
    neck=dict(
        _delete_=True,
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_input",
        num_outs=5,
    ),
    rpn_head=dict(
        reg_decoded_bbox=False,
        gamma=2.0,
        aug_reg_loss=dict(type="MSELoss", loss_weight=2.0),
        loss_bbox=dict(_delete_=True, type="CIoULoss", loss_weight=1.0),
    ),
    roi_head=dict(bbox_head=dict(num_classes=80)),
)
data = dict(samples_per_gpu=2, workers_per_gpu=2)
