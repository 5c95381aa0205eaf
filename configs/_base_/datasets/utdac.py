# UTDAC2020 underwater dataset (plain COCO json, 4 classes:
# echinus / holothurian / scallop / starfish — reference
# configs/_base_/datasets/utdac_detection_coco.py).
dataset_type = "CocoDataset"
data_root = "data/UTDAC2020/"
classes = ("echinus", "holothurian", "scallop", "starfish")

# TPU input pipeline: keep-ratio resize into a fixed padded canvas so XLA
# compiles once (replaces Resize/Normalize/Pad/Collect pipeline ops).
img_norm = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)
train_pipeline = dict(
    scale=(1333, 800),
    keep_ratio=True,
    flip_prob=0.5,
    canvas=(800, 1344),  # H, W (landscape bucket); portrait bucket mirrored
    max_gt=100,
)
test_pipeline = dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344))

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=8,
    train=dict(
        type=dataset_type,
        classes=classes,
        ann_file=data_root + "annotations/instances_train2017.json",
        img_prefix=data_root + "train2017/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        classes=classes,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "val2017/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        classes=classes,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "val2017/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="bbox")
