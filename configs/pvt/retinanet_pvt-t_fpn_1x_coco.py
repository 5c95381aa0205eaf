# RetinaNet with a PVT-Tiny backbone (reference
# configs/pvt/retinanet_pvt-t_fpn_1x_coco.py: num_layers [2,2,2,2], AdamW).
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]

model = dict(
    backbone=dict(
        type="PyramidVisionTransformer",
        num_layers=[2, 2, 2, 2],
        init_cfg=dict(
            type="Pretrained",
            checkpoint="https://github.com/whai362/PVT/releases/download/v2/pvt_tiny.pth",
        ),
    ),
    neck=dict(in_channels=[64, 128, 320, 512]),
)

optimizer = dict(type="adamw", lr=0.0001, weight_decay=0.0001)
