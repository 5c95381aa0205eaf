# Reference configs/pisa/pisa_mask_rcnn_x101_32x4d_fpn_1x_coco.
_base_ = "./pisa_mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeXt",
        depth=101,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        groups=32,
        base_width=4,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://resnext101_32x4d",
        ),
    ),
)
