# Reference configs/pisa/pisa_faster_rcnn_r50_fpn_1x_coco (ISR-P + CARL on the R-CNN stage).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    train_cfg=dict(
        rcnn=dict(
            isr=dict(k=2, bias=0),
            carl=dict(k=1, bias=0.2),
        ),
    ),
)
