# Reference configs/hrnet/cascade_mask_rcnn_hrnetv2p_w32_20e_coco.
_base_ = "../cascade_rcnn/cascade_mask_rcnn_r50_fpn_20e_coco.py"
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
