# Reference configs/ensemble/boosting_rcnn_r50_fpn_1x_coco (plain-RPN
# boosting: focal RPN objectness + BoostRoIHead on Shared2FC).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    rpn_head=dict(
        loss_cls=dict(_delete_=True, type="FocalLoss", use_sigmoid=True,
                      gamma=2.0, alpha=0.25, loss_weight=0.5),
    ),
    roi_head=dict(
        type="BoostRoIHead",
        gamma=0.5,
        bbox_head=dict(num_classes=4),
    ),
)
