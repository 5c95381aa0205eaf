# Reference configs/hrnet/cascade_rcnn_hrnetv2p_w40_20e_coco.
_base_ = "./cascade_rcnn_hrnetv2p_w32_20e_coco.py"
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
    ),
)
