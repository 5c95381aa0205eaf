# FreeAnchor RetinaNet (reference
# configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]

model = dict(
    type="FreeAnchor",
    bbox_head=dict(
        type="FreeAnchorRetinaHead",
        pre_anchor_topk=50,
        bbox_thr=0.6,
        gamma=2.0,
        alpha=0.5,
        loss_bbox=dict(type="SmoothL1Loss", beta=0.11, loss_weight=0.75),
    ),
)
