# Reference configs/gcnet/mask_rcnn_r50_fpn_syncbn-backbone_1x_coco (plain syncbn baseline of the GCNet table).
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(norm_cfg=dict(type="SyncBN", requires_grad=True), norm_eval=False)
)
