# SUO-DAC underwater domain-generalization splits (fork contribution,
# reference _base_/datasets/suodac_detection.py): per-domain file lists +
# domain labels threaded by DetDataLoader(domain_file=...).
_base_ = "./utdac.py"
data_root = "data/SUODAC2020/"
data = dict(
    train=dict(
        ann_file=data_root + "annotations/train.json",
        img_prefix=data_root + "train/",
        domain_file=data_root + "annotations/domains.json",
    ),
    val=dict(
        ann_file=data_root + "annotations/val.json",
        img_prefix=data_root + "val/",
    ),
    test=dict(
        ann_file=data_root + "annotations/test.json",
        img_prefix=data_root + "test/",
    ),
)
