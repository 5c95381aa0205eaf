# Reference configs/hrnet/fcos_hrnetv2p_w40_gn-head_mstrain_640-800_4x4_2x_coco.
_base_ = "./fcos_hrnetv2p_w32_gn-head_4x4_2x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="HRNet",
        arch="w40",
        frozen_stages=-1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://msra/hrnetv2_w40"
        ),
    ),
    neck=dict(
        _delete_=True,
        type="HRFPN",
        in_channels=[40, 80, 160, 320],
        out_channels=256,
        num_outs=5,
        stride=2,
    ),
)
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
