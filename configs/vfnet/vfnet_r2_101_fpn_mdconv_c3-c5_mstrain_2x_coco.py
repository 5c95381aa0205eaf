# Reference configs/vfnet/vfnet_r2_101_fpn_mdconv_c3-c5_mstrain_2x_coco.
_base_ = "./vfnet_r50_fpn_mdconv_c3-c5_mstrain_2x_coco.py"
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
        dcn=dict(type="DCNv2", deform_groups=1, fallback_on_stride=False),
        stage_with_dcn=(False, True, True, True),
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://res2net101_v1d_26w_4s",
        ),
    ),
)
