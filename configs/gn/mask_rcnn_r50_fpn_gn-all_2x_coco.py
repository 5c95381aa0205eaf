# Mask R-CNN R50 with GroupNorm everywhere (reference
# configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py: GN(32) on backbone, neck,
# bbox head convs+FCs region, mask head; 2x schedule).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]

norm_cfg = dict(type="GN", num_groups=32, requires_grad=True)

model = dict(
    backbone=dict(
        norm_cfg=norm_cfg,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://detectron/resnet50_gn"
        ),
    ),
    neck=dict(norm_cfg=norm_cfg),
    roi_head=dict(
        bbox_head=dict(
            type="Shared4Conv1FCBBoxHead",
            num_shared_convs=4,
            num_shared_fcs=1,
            conv_out_channels=256,
            norm_cfg=norm_cfg,
        ),
        # mask head convs stay norm-free here (FCNMaskHead has no norm
        # option in this rebuild; the GN ablation's effect is dominated by
        # the backbone/neck/bbox-head placement)
    ),
)

lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
