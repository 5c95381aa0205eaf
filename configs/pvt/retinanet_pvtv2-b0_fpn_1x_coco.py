# RetinaNet with a PVTv2-B0 backbone (reference
# configs/pvt/retinanet_pvtv2-b0_fpn_1x_coco.py: embed_dims 32, conv FFN,
# no abs pos embed).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]

model = dict(
    backbone=dict(
        type="PyramidVisionTransformerV2",
        embed_dims=32,
        num_layers=[2, 2, 2, 2],
        init_cfg=dict(
            type="Pretrained",
            checkpoint="https://github.com/whai362/PVT/releases/download/v2/pvt_v2_b0.pth",
        ),
    ),
    neck=dict(in_channels=[32, 64, 160, 256]),
)

optimizer = dict(type="adamw", lr=0.0001, weight_decay=0.0001)
