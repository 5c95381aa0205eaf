# Reference configs/hrnet/cascade_mask_rcnn_hrnetv2p_w18_20e_coco.
_base_ = "./cascade_mask_rcnn_hrnetv2p_w32_20e_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="HRNet",
        arch="w18",
        frozen_stages=-1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://msra/hrnetv2_w18"
        ),
    ),
    neck=dict(
        _delete_=True,
        type="HRFPN",
        in_channels=[18, 36, 72, 144],
        out_channels=256,
        num_outs=5,
    ),
)
