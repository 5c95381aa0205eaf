# RetinaNet with Gradient Harmonizing Mechanism losses (reference
# configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py).  momentum>0 is the
# reference's EMA-of-bin-counts variant; the acc_sum buffers live in
# batch_stats (RetinaConvs) and thread through the train step.
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]

model = dict(
    bbox_head=dict(
        loss_cls=dict(
            type="GHMC",
            bins=30,
            momentum=0.75,
            use_sigmoid=True,
            loss_weight=1.0,
        ),
        loss_bbox=dict(
            type="GHMR",
            mu=0.02,
            bins=10,
            momentum=0.7,
            loss_weight=10.0,
        ),
    )
)
