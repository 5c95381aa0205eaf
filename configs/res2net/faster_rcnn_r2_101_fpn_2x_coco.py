# Faster R-CNN Res2Net-101 2x (reference
# configs/res2net/faster_rcnn_r2_101_fpn_2x_coco.py: scales 4, base_width 26).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    backbone=dict(
        type="Res2Net",
        depth=101,
        scales=4,
        base_width=26,
        init_cfg=dict(type="Pretrained", checkpoint="open-mmlab://res2net101_v1d_26w_4s"),
    )
)

lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
