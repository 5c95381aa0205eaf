# TrashCan material-version dataset (fork contribution).
_base_ = "./trashcan_instance.py"
dataset_type = "TrashCanMaterialDataset"
data_root = "data/trashcan/material_version/"
data = dict(
    train=dict(type=dataset_type,
               ann_file=data_root + "instances_train_trashcan.json",
               img_prefix=data_root + "train/"),
    val=dict(type=dataset_type,
             ann_file=data_root + "instances_val_trashcan.json",
             img_prefix=data_root + "val/"),
    test=dict(type=dataset_type,
              ann_file=data_root + "instances_val_trashcan.json",
              img_prefix=data_root + "val/"),
)
