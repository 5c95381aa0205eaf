# Mask R-CNN R50-FPN on LVIS v1 (reference configs/lvis/
# mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py: 1203 classes,
# class-balanced oversampling 1e-3, mstrain [640, 800], score_thr 1e-4
# with no per-class cap at test).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
model = dict(
    roi_head=dict(
        bbox_head=dict(num_classes=1203),
        mask_head=dict(num_classes=1203),
    ),
    test_cfg=dict(rcnn=dict(score_thr=0.0001, max_per_img=300)),
)
optimizer = dict(lr=0.02)
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=300, with_masks=True,
    mstrain_range=(640, 800),
)
data = dict(train=dict(dataset=dict(pipeline=train_pipeline)))
