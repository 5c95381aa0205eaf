# TrashCan instance-version dataset (fork contribution, reference
# _base_/datasets/trashcan_instance.py).
_base_ = "./coco_instance.py"
dataset_type = "TrashCanInstanceDataset"
data_root = "data/trashcan/instance_version/"
data = dict(
    train=dict(
        type=dataset_type,
        ann_file=data_root + "instances_train_trashcan.json",
        img_prefix=data_root + "train/",
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "instances_val_trashcan.json",
        img_prefix=data_root + "val/",
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "instances_val_trashcan.json",
        img_prefix=data_root + "val/",
    ),
)
