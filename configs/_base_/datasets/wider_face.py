# WIDER Face (reference _base_/datasets/wider_face.py): single 'face'
# class, VOC-style XML annotations.
dataset_type = "WIDERFaceDataset"
data_root = "data/WIDERFace/"
train_pipeline = dict(
    scale=(300, 300), keep_ratio=False, flip_prob=0.5,
    canvas=(300, 300), max_gt=300,
)
test_pipeline = dict(scale=(300, 300), keep_ratio=False, canvas=(300, 300))
data = dict(
    samples_per_gpu=16,
    workers_per_gpu=4,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "train.txt",
        img_prefix=data_root + "WIDER_train/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "val.txt",
        img_prefix=data_root + "WIDER_val/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "val.txt",
        img_prefix=data_root + "WIDER_val/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=1, metric="mAP")
