# Strong-baseline Mask R-CNN (reference configs/strong_baselines/
# mask_rcnn_r50_fpn_syncbn-all_rpn-2conv_lsj_100e_coco.py): SyncBN in
# backbone/neck/heads, 2-conv RPN, large-scale-jitter 100e recipe,
# trained from scratch (no frozen stages, no pretrained init).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../common/lsj_100e_coco_instance.py",
]
norm_cfg = dict(type="SyncBN", requires_grad=True)
model = dict(
    backbone=dict(
        frozen_stages=-1, norm_eval=False, norm_cfg=norm_cfg, init_cfg=None),
    neck=dict(norm_cfg=norm_cfg),
    rpn_head=dict(num_convs=2),
    roi_head=dict(
        bbox_head=dict(
            type="Shared4Conv1FCBBoxHead",
            num_shared_convs=4,
            num_shared_fcs=1,
            conv_out_channels=256,
            norm_cfg=norm_cfg,
        ),
        mask_head=dict(norm_cfg=norm_cfg),
    ),
)
