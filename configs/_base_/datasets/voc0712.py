# PASCAL VOC 07+12 trainval, VOC07 test (reference _base_/datasets/
# voc0712.py); the loader reads XML annotations through VOCDataset.
dataset_type = "VOCDataset"
data_root = "data/VOCdevkit/"
img_norm = dict(
    mean=[123.675, 116.28, 103.53], std=[58.395, 57.12, 57.375], to_rgb=True
)
train_pipeline = dict(
    scale=(1000, 600), keep_ratio=True, flip_prob=0.5,
    canvas=(608, 1024), max_gt=100,
)
test_pipeline = dict(scale=(1000, 600), keep_ratio=True, canvas=(608, 1024))
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type="ConcatDataset",
        datasets=[
            dict(
                type=dataset_type,
                ann_file=data_root + "VOC2007/ImageSets/Main/trainval.txt",
                img_prefix=data_root + "VOC2007/",
                pipeline=train_pipeline,
            ),
            dict(
                type=dataset_type,
                ann_file=data_root + "VOC2012/ImageSets/Main/trainval.txt",
                img_prefix=data_root + "VOC2012/",
                pipeline=train_pipeline,
            ),
        ],
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="mAP")
