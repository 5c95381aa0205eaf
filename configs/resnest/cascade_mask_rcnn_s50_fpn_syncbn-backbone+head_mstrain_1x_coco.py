# Reference configs/resnest/cascade_mask_rcnn_s50_fpn_syncbn-backbone+head_mstrain_1x_coco.
_base_ = "../cascade_rcnn/cascade_mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeSt",
        depth=50,
        radix=2,
        reduction_factor=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_cfg=dict(type="SyncBN", requires_grad=True),
        norm_eval=False,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://resnest50"
        ),
    ),
)
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800), with_masks=True)))
