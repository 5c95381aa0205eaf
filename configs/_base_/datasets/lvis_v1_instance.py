# LVIS v1 (reference _base_/datasets/lvis_v1_instance.py): federated
# annotations, ClassBalancedDataset oversampling wrapper.
dataset_type = "LVISV1Dataset"
data_root = "data/lvis_v1/"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=300, with_masks=True,
)
test_pipeline = dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344))
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=2,
    train=dict(
        type="ClassBalancedDataset",
        oversample_thr=1e-3,
        dataset=dict(
            type=dataset_type,
            ann_file=data_root + "annotations/lvis_v1_train.json",
            img_prefix=data_root,
            pipeline=train_pipeline,
        ),
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=24, metric=["bbox", "segm"])
