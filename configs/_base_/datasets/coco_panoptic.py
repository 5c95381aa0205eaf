# COCO panoptic (reference _base_/datasets/coco_panoptic.py): panoptic
# json + PNG id maps; thing instances as detection targets + per-pixel
# semantic raster for the stuff head.
dataset_type = "CocoPanopticDataset"
data_root = "data/coco/"
img_norm = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    with_semantic=True, semantic_stride=4,
)
test_pipeline = dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344))
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/panoptic_train2017.json",
        img_prefix=data_root + "train2017/",
        seg_prefix=data_root + "annotations/panoptic_train2017/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/panoptic_val2017.json",
        img_prefix=data_root + "val2017/",
        seg_prefix=data_root + "annotations/panoptic_val2017/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/panoptic_val2017.json",
        img_prefix=data_root + "val2017/",
        seg_prefix=data_root + "annotations/panoptic_val2017/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric=["PQ"])
