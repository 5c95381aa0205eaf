# Reference configs/resnest/mask_rcnn_s101_fpn_syncbn-backbone+head_mstrain_1x_coco.
_base_ = "./mask_rcnn_s50_fpn_syncbn-backbone+head_mstrain_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeSt",
        depth=101,
        radix=2,
        reduction_factor=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_cfg=dict(type="SyncBN", requires_grad=True),
        norm_eval=False,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://resnest101"
        ),
    ),
)
