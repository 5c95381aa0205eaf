# Faster R-CNN trained FROM SCRATCH with GN (reference
# configs/scratch/faster_rcnn_r50_fpn_gn-all_scratch_6x_coco.py: no
# pretrained init, zero frozen stages, GN everywhere, 6x schedule).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

norm_cfg = dict(type="GN", num_groups=32, requires_grad=True)

model = dict(
    backbone=dict(
        frozen_stages=-1,
        zero_init_residual=False,
        norm_cfg=norm_cfg,
        init_cfg=None,
    ),
    neck=dict(norm_cfg=norm_cfg),
    roi_head=dict(
        bbox_head=dict(
            type="Shared4Conv1FCBBoxHead",
            num_shared_convs=4,
            num_shared_fcs=1,
            conv_out_channels=256,
            norm_cfg=norm_cfg,
        )
    ),
)

lr_config = dict(step=[65, 71])
runner = dict(max_epochs=73)
