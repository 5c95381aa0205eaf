# Mask R-CNN from a MoCo-v2 self-supervised backbone (reference configs/
# selfsup_pretrain/mask_rcnn_r50_fpn_mocov2-pretrain_1x_coco.py): stage-0
# unfrozen, SyncBN, norm_eval off; init from a converted selfsup
# checkpoint (tools/convert_checkpoint.py handles torchvision-layout
# state dicts).
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        frozen_stages=0,
        norm_cfg=dict(type="SyncBN", requires_grad=True),
        norm_eval=False,
        init_cfg=dict(type="Pretrained",
                      checkpoint="./mocov2_r50_800ep_pretrain.pth"),
    )
)
