# Reference configs/gcnet/mask_rcnn_r101_fpn_syncbn-backbone_r4_gcb_c3-c5_1x_coco.
_base_ = "./mask_rcnn_r101_fpn_r4_gcb_c3-c5_1x_coco.py"
model = dict(
    backbone=dict(norm_cfg=dict(type="SyncBN", requires_grad=True), norm_eval=False)
)
