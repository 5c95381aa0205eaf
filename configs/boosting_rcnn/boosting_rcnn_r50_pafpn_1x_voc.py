# Boosting R-CNN R50-PAFPN on Pascal VOC (COCO-style eval on VOC data, as in
# the reference's VOC boosting config).
_base_ = ["./boosting_rcnn_r50_pafpn_1x_utdac.py"]

model = dict(roi_head=dict(bbox_head=dict(num_classes=20)))

dataset_type = "VOCDataset"
data_root = "data/VOCdevkit/"
data = dict(
    _delete_=True,
    samples_per_gpu=4,
    workers_per_gpu=8,
    train=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/trainval.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=dict(scale=(1000, 600), keep_ratio=True, flip_prob=0.5,
                      canvas=(608, 1024), max_gt=100),
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=dict(scale=(1000, 600), keep_ratio=True, canvas=(608, 1024)),
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
        img_prefix=data_root + "VOC2007/",
        pipeline=dict(scale=(1000, 600), keep_ratio=True, canvas=(608, 1024)),
    ),
)
evaluation = dict(interval=1, metric=["mAP", "bbox"])
