# DeepFashion landmark/clothes detection (reference _base_/datasets/
# deepfashion.py; 15 categories, COCO-format json).
dataset_type = "DeepFashionDataset"
data_root = "data/DeepFashion/In-shop/"
train_pipeline = dict(
    scale=(750, 1101), keep_ratio=True, flip_prob=0.5,
    canvas=(768, 1120), max_gt=100, with_masks=True,
)
test_pipeline = dict(scale=(750, 1101), keep_ratio=True, canvas=(768, 1120))
data = dict(
    samples_per_gpu=2,
    workers_per_gpu=1,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/DeepFashion_segmentation_train.json",
        img_prefix=data_root + "Img/",
        pipeline=train_pipeline,
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/DeepFashion_segmentation_query.json",
        img_prefix=data_root + "Img/",
        pipeline=test_pipeline,
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/DeepFashion_segmentation_gallery.json",
        img_prefix=data_root + "Img/",
        pipeline=test_pipeline,
    ),
)
evaluation = dict(interval=5, metric=["bbox", "segm"])
