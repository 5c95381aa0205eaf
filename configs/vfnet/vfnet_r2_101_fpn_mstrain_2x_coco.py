# Reference configs/vfnet/vfnet_r2_101_fpn_mstrain_2x_coco.
_base_ = "./vfnet_r50_fpn_mstrain_2x_coco.py"
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
