# Cascade R-CNN Res2Net-101 20e (reference
# configs/res2net/cascade_rcnn_r2_101_fpn_20e_coco.py).
_base_ = ["../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    backbone=dict(
        type="Res2Net",
        depth=101,
        scales=4,
        base_width=26,
        init_cfg=dict(type="Pretrained", checkpoint="open-mmlab://res2net101_v1d_26w_4s"),
    )
)

lr_config = dict(step=[16, 19])
runner = dict(max_epochs=20)
