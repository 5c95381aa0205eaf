# DANN domain-adversarial Faster R-CNN on SUO-DAC (reference
# detectors/faster_rcnn.py:47 DGFasterRCNN — exported but shipped with no
# config upstream; this config exercises the rebuilt wrapper with the
# reference's hardcoded hyperparameters: domain_cls(512, num_domains=2),
# total_img = 112128/2, loss weight 0.1, D trained by Adam(1e-3)+clip 0.1).
# Requires domain labels: pipeline key domain_file= (data/suodac.py).
_base_ = [
    "../_base_/models/faster_rcnn_r50_fpn.py",
    "../_base_/datasets/suodac_detection.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="DGFasterRCNN",
    num_domains=2,
    total_img=56064,
    roi_head=dict(bbox_head=dict(num_classes=4)),
)
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
