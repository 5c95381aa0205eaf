# DGaug ("DMC") Faster R-CNN on SUO-DAC (reference configs/suodac/
# DMC_faster_rcnn_r50_fpn_1x.py -> DGaugFasterRCNN,
# detectors/faster_rcnn.py:544): trains on water-style-transferred images.
# The reference stylizes on-GPU with a privately-trained WaterTransfer
# checkpoint; the rebuild stylizes host-side with the checkpoint-free
# transfer core (pipeline key dgaug=True -> batch["img_aug"]).  The
# HiddenMixupResNet backbone matches the reference config (its shipped
# two-view mixup is commented out upstream — models/detectors/dg.py).
_base_ = [
    "../_base_/models/faster_rcnn_r50_fpn.py",
    "../_base_/datasets/suodac_detection.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="DGaugFasterRCNN",
    backbone=dict(type="HiddenMixupResNet"),
    roi_head=dict(bbox_head=dict(num_classes=4)),
)
data = dict(train=dict(pipeline=dict(dgaug=True)))
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
