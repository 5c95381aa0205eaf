# Reference configs/res2net/cascade_mask_rcnn_r2_101_fpn_20e_coco.
_base_ = "../cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="Res2Net",
        depth=101,
        scales=4,
        base_width=26,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://res2net101_v1d_26w_4s",
        ),
    ),
)
