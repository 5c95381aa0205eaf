# Reference configs/paa/paa_qfl_r50_fpn_1x_coco (fork variant: PAA with a
# quality focal classification loss — IoU soft targets at positives).
_base_ = "./paa_r50_fpn_1x_coco.py"
model = dict(
    bbox_head=dict(
        loss_cls=dict(
            _delete_=True,
            type="QualityFocalLoss",
            use_sigmoid=True,
            beta=2.0,
            loss_weight=1.0,
        ),
    ),
)
