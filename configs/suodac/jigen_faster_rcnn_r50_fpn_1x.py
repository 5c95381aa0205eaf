# JiGEN (jigsaw self-supervised) Faster R-CNN on SUO-DAC (reference
# detectors/faster_rcnn.py:382 JiGENFasterRCNN — exported but shipped with
# no config or puzzle loader upstream; this config exercises the rebuilt
# wrapper: jig_cls(2048, 31) on the C5 GAP of a 3x3 tile-permuted view,
# BCE * 0.1, D trained by Adam(1e-3)+clip 0.1.  The loader generates the
# puzzles (pipeline key jigsaw=31 -> batch["img_puzzle"/"jig_labels"]).
_base_ = [
    "../_base_/models/faster_rcnn_r50_fpn.py",
    "../_base_/datasets/suodac_detection.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="JiGENFasterRCNN",
    jig_classes=31,
    roi_head=dict(bbox_head=dict(num_classes=4)),
)
data = dict(train=dict(pipeline=dict(jigsaw=31)))
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
