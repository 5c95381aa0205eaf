# Reference configs/pascal_voc/faster_rcnn_r50_fpn_1x_voc0712_cocofmt (VOC converted to COCO json — pairs with tools/dataset_converters).
_base_ = "./faster_rcnn_r50_fpn_1x_voc0712.py"
data = dict(
    train=dict(
        _delete_=True,
        type="CocoDataset",
        ann_file="data/VOCdevkit/annotations/voc0712_trainval.json",
        img_prefix="data/VOCdevkit/",
        classes=None,
        pipeline=dict(scale=(1000, 600), keep_ratio=True, flip_prob=0.5,
                      canvas=(640, 1024), max_gt=100),
    ),
    val=dict(
        _delete_=True,
        type="CocoDataset",
        ann_file="data/VOCdevkit/annotations/voc07_test.json",
        img_prefix="data/VOCdevkit/",
        classes=None,
        pipeline=dict(scale=(1000, 600), keep_ratio=True,
                      canvas=(640, 1024)),
    ),
    test=dict(
        _delete_=True,
        type="CocoDataset",
        ann_file="data/VOCdevkit/annotations/voc07_test.json",
        img_prefix="data/VOCdevkit/",
        classes=None,
        pipeline=dict(scale=(1000, 600), keep_ratio=True,
                      canvas=(640, 1024)),
    ),
)
evaluation = dict(metric="bbox")
