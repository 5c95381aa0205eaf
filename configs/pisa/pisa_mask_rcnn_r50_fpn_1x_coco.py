# Reference configs/pisa/pisa_mask_rcnn_r50_fpn_1x_coco.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    train_cfg=dict(
        rcnn=dict(
            isr=dict(k=2, bias=0),
            carl=dict(k=1, bias=0.2),
        ),
    ),
)
