# COCO 2017 detection (80 classes).
dataset_type = "CocoDataset"
data_root = "data/coco/"
classes = None  # default COCO-80

img_norm = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)
train_pipeline = dict(
    scale=(1333, 800),
    keep_ratio=True,
    flip_prob=0.5,
    canvas=(800, 1344),
    max_gt=100,
)
test_pipeline = dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344))

data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_train2017.json",
        img_prefix=data_root + "train2017/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "val2017/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/instances_val2017.json",
        img_prefix=data_root + "val2017/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="bbox")
