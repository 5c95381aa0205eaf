# Cityscapes detection (reference _base_/datasets/cityscapes_detection.py;
# 8 instance classes, 2048x1024 frames).
dataset_type = "CityscapesDataset"
data_root = "data/cityscapes/"
train_pipeline = dict(
    scale=(2048, 1024), keep_ratio=True, flip_prob=0.5,
    canvas=(1024, 2048), max_gt=100,
    mstrain_range=(800, 1024),
)
test_pipeline = dict(scale=(2048, 1024), keep_ratio=True, canvas=(1024, 2048))
data = dict(
    samples_per_gpu=1,
    workers_per_gpu=2,
    train=dict(
        type=dataset_type,
        ann_file=data_root
        + "annotations/instancesonly_filtered_gtFine_train.json",
        img_prefix=data_root + "leftImg8bit/train/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root
        + "annotations/instancesonly_filtered_gtFine_val.json",
        img_prefix=data_root + "leftImg8bit/val/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root
        + "annotations/instancesonly_filtered_gtFine_val.json",
        img_prefix=data_root + "leftImg8bit/val/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="bbox")
