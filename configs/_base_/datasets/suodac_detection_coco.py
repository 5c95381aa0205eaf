# Reference configs/_base_/datasets/suodac_detection_coco.py: the SUO-DAC
# splits re-exported as plain COCO json (CocoDataset instead of the
# VOC-style LoadImageFromSUODAC loader; source domains type1-type6 merged
# at json-build time).  Same canvas/normalization as utdac.
_base_ = "./utdac.py"
data_root = "data/SUODAC2020/"
data = dict(
    train=dict(
        ann_file=data_root + "annotations/train_coco.json",
        img_prefix=data_root + "train/",
    ),
    val=dict(
        ann_file=data_root + "annotations/val_coco.json",
        img_prefix=data_root + "val/",
    ),
    test=dict(
        ann_file=data_root + "annotations/test_coco.json",
        img_prefix=data_root + "test/",
    ),
)
