# Brackish underwater dataset (fork contribution, reference
# _base_/datasets/brackish_detection.py).
_base_ = "./coco_detection.py"
dataset_type = "BrackishDataset"
data_root = "data/brackish/"
data = dict(
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/train.json",
        img_prefix=data_root + "images/",
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/valid.json",
        img_prefix=data_root + "images/",
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/test.json",
        img_prefix=data_root + "images/",
    ),
)
