# AutoAssign R50-FPN (reference
# configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py).
_base_ = ["../fcos/fcos_r50_fpn_1x_coco.py"]

model = dict(
    type="AutoAssign",
    bbox_head=dict(
        type="AutoAssignHead",
        pos_loss_weight=0.25,
        neg_loss_weight=0.75,
        center_loss_weight=0.75,
        loss_bbox=dict(type="GIoULoss", loss_weight=5.0),
    ),
)
