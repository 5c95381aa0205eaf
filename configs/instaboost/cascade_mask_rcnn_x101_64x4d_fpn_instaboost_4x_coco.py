# Reference configs/instaboost/cascade_mask_rcnn_x101_64x4d_fpn_instaboost_4x_coco.
_base_ = "./cascade_mask_rcnn_r50_fpn_instaboost_4x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeXt",
        depth=101,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        groups=64,
        base_width=4,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://resnext101_64x4d",
        ),
    ),
)
