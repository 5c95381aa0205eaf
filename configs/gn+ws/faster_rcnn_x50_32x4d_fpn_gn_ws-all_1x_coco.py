# Reference configs/gn+ws/faster_rcnn_x50_32x4d_fpn_gn_ws-all_1x_coco.
_base_ = "./faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeXt",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        groups=32,
        base_width=4,
        conv_cfg=dict(type="ConvWS"),
        norm_cfg=dict(type="GN", num_groups=32, requires_grad=True),
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://jhu/resnext50_32x4d_gn_ws"
        ),
    ),
)
