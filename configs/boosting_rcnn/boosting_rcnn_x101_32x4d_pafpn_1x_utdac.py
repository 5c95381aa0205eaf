# Boosting R-CNN ResNeXt-101 32x4d PAFPN 1x UTDAC (reference x101 variant).
_base_ = ["./boosting_rcnn_r50_pafpn_1x_utdac.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="ResNeXt",
        depth=101,
        groups=32,
        base_width=4,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://resnext101_32x4d"
        ),
    ),
)
