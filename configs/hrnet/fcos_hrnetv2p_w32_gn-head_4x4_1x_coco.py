# Reference configs/hrnet/fcos_hrnetv2p_w32_gn-head_4x4_1x_coco.
_base_ = "./fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="HRNet",
        arch="w32",
        frozen_stages=-1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://msra/hrnetv2_w32"
        ),
    ),
    neck=dict(
        _delete_=True,
        type="HRFPN",
        in_channels=[32, 64, 128, 256],
        out_channels=256,
        num_outs=5,
        stride=2,
    ),
)
