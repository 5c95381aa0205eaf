# Faster R-CNN ResNeSt-50 with live (sync) BN in backbone+heads and
# multi-scale range training (reference configs/resnest/
# faster_rcnn_s50_fpn_syncbn-backbone+head_mstrain-range_1x_coco.py).
# SyncBN ≙ LiveBatchNorm with cross-replica batch-stat reductions under
# pjit (models/layers.py).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    backbone=dict(
        type="ResNeSt",
        depth=50,
        radix=2,
        stem_channels=64,
        norm_eval=False,  # SyncBN: live cross-replica stats
        init_cfg=dict(type="Pretrained", checkpoint="open-mmlab://resnest50"),
    ),
    roi_head=dict(
        bbox_head=dict(
            type="Shared4Conv1FCBBoxHead",
            num_shared_convs=4,
            num_shared_fcs=1,
            conv_out_channels=256,
            norm_cfg=dict(type="BN", requires_grad=True),
        )
    ),
)

data = dict(
    train=dict(pipeline=dict(mstrain_range=(640, 800))),
)
