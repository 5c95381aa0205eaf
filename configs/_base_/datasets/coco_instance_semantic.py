# COCO instance + stuff maps for HTC's fused semantic branch (reference
# _base_/datasets/coco_instance_semantic.py: seg_prefix=stuffthingmaps +
# LoadAnnotations(with_seg=True) + SegRescale(1/8)).
_base_ = "./coco_instance.py"
data_root = "data/coco/"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    with_semantic=True, semantic_stride=8,
)
data = dict(
    train=dict(
        seg_prefix=data_root + "stuffthingmaps/train2017/",
        pipeline=train_pipeline,
    )
)
