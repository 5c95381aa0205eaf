# Mask R-CNN from a SwAV self-supervised backbone (reference configs/
# selfsup_pretrain/mask_rcnn_r50_fpn_swav-pretrain_1x_coco.py).
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        frozen_stages=0,
        norm_cfg=dict(type="SyncBN", requires_grad=True),
        norm_eval=False,
        init_cfg=dict(type="Pretrained",
                      checkpoint="./swav_800ep_pretrain.pth.tar"),
    )
)
