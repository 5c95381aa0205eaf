# Mask R-CNN with Seesaw loss on LVIS v1 (reference configs/seesaw_loss/
# mask_rcnn_r50_fpn_random_seesaw_loss_mstrain_2x_lvis_v1.py: Seesaw
# p=0.8 q=2.0 replaces CE in the box head, 1203 classes, score_thr 0).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    roi_head=dict(
        bbox_head=dict(
            num_classes=1203,
            loss_cls=dict(
                type="SeesawLoss", p=0.8, q=2.0, num_classes=1203,
                loss_weight=1.0,
            ),
        ),
        mask_head=dict(num_classes=1203),
    ),
    test_cfg=dict(
        rcnn=dict(
            score_thr=0.0001,
            max_per_img=300,
        )
    ),
)

dataset_type = "LVISV1Dataset"
data_root = "data/lvis_v1/"
data = dict(
    train=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/lvis_v1_train.json",
        img_prefix=data_root,
        pipeline=dict(
            scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
            canvas=(800, 1344), max_gt=300, mstrain_range=(640, 800),
        ),
    ),
    val=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
        pipeline=dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344)),
    ),
    test=dict(
        type=dataset_type,
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
        pipeline=dict(scale=(1333, 800), keep_ratio=True, canvas=(800, 1344)),
    ),
)
evaluation = dict(interval=24, metric=["bbox", "segm"])

lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
