# Reference configs/fpg/mask_rcnn_r50_fpn_crop640_50e_coco.
_base_ = "./mask_rcnn_r50_fpg_crop640_50e_coco.py"
model = dict(
    neck=dict(
        _delete_=True,
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        norm_cfg=dict(type="BN", requires_grad=True),
    ),
)
