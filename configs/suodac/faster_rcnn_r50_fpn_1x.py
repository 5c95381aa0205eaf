# Faster R-CNN R50-FPN on SUO-DAC (reference configs/suodac/
# faster_rcnn_r50_fpn_1x.py, the fork's underwater domain-generalisation
# benchmark; 4 classes, domain labels available via
# DetDataLoader(domain_file=...)).  The DG detector wrappers are rebuilt in
# models/detectors/dg.py (see DMC_/dg_/jigen_faster_rcnn configs here).
_base_ = [
    "../_base_/models/faster_rcnn_r50_fpn.py",
    "../_base_/datasets/suodac_detection.py",
    "../_base_/default_runtime.py",
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=4)))
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
