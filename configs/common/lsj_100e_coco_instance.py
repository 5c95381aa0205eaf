# Large-scale-jitter 100e COCO instance recipe (reference configs/common/
# lsj_100e_coco_instance.py: Resize (1024,1024) ratio (0.1,2.0) keep-ratio
# + RandomCrop (1024,1024); RepeatDataset x4 over 25 epochs; bs64 SGD).
_base_ = [
    "../_base_/datasets/coco_instance.py",
    "../_base_/default_runtime.py",
]
train_pipeline = dict(
    scale=(1024, 1024), keep_ratio=True, flip_prob=0.5,
    canvas=(1024, 1024), max_gt=100, with_masks=True,
    lsj_range=(0.1, 2.0),
)
data = dict(
    samples_per_gpu=8,
    train=dict(
        _delete_=True,
        type="RepeatDataset", times=4,
        dataset=dict(
            type="CocoDataset",
            ann_file="data/coco/annotations/instances_train2017.json",
            img_prefix="data/coco/train2017/",
            pipeline=train_pipeline,
        ),
    ),
)
evaluation = dict(interval=5, metric=["bbox", "segm"])
optimizer = dict(type="sgd", lr=0.1, momentum=0.9, weight_decay=4e-5)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step", warmup="linear", warmup_iters=500, warmup_ratio=0.067,
    step=[22, 24],
)
runner = dict(type="EpochBasedRunner", max_epochs=25)
