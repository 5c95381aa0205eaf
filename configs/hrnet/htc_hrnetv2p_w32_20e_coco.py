# Reference configs/hrnet/htc_hrnetv2p_w32_20e_coco.
_base_ = "../htc/htc_r50_fpn_1x_coco.py"
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
    ),
)
lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
