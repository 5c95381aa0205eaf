# Reference configs/gn+ws/mask_rcnn_x101_32x4d_fpn_gn_ws-all_2x_coco.
_base_ = "./mask_rcnn_r50_fpn_gn_ws-all_2x_coco.py"
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
        conv_cfg=dict(type="ConvWS"),
        norm_cfg=dict(type="GN", num_groups=32, requires_grad=True),
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://jhu/resnext101_32x4d_gn_ws"
        ),
    ),
)
