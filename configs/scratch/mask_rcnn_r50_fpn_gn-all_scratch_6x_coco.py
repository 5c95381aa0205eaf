# Reference configs/scratch/mask_rcnn_r50_fpn_gn-all_scratch_6x_coco.
_base_ = "../gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py"
model = dict(
    backbone=dict(frozen_stages=-1, zero_init_residual=False,
                  init_cfg=None),
)
optimizer = dict(weight_decay=4e-5)
lr_config = dict(step=[65, 71])
runner = dict(max_epochs=73)
