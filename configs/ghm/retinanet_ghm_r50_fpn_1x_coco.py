# RetinaNet with Gradient Harmonizing Mechanism losses (reference
# configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py).  Deviation: the reference
# runs GHM-C with momentum=0.75 (EMA of bin counts held as module state);
# this rebuild's pure-functional loss uses the stateless per-batch density
# (momentum=0 semantics) and raises if momentum>0 is requested
# (ops/losses.py ghm_c_loss) — recorded in ARCHITECTURE.md deviations.
_base_ = ["../retinanet/retinanet_r50_fpn_1x_coco.py"]

model = dict(
    bbox_head=dict(
        loss_cls=dict(
            type="GHMC",
            bins=30,
            momentum=0.0,
            use_sigmoid=True,
            loss_weight=1.0,
        ),
        loss_bbox=dict(
            type="GHMR",
            mu=0.02,
            bins=10,
            momentum=0.0,
            loss_weight=10.0,
        ),
    )
)
