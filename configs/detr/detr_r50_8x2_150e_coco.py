# DETR R50 150e COCO (reference configs/detr values).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
]

model = dict(
    type="DETR",
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(3,),
        frozen_stages=1,
        norm_eval=True,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet50"),
    ),
    bbox_head=dict(
        type="DETRHead",
        num_classes=80,
        num_query=100,
        embed_dims=256,
        enc_layers=6,
        dec_layers=6,
        loss_cls=dict(type="CrossEntropyLoss", loss_weight=1.0),
        loss_bbox=dict(type="L1Loss", loss_weight=5.0),
        loss_iou=dict(type="GIoULoss", loss_weight=2.0),
    ),
    train_cfg=dict(assigner=dict(type="HungarianAssigner")),
    test_cfg=dict(max_per_img=100),
)
optimizer = dict(type="adamw", lr=0.0001, weight_decay=0.0001)
lr_config = dict(policy="step", step=[100])
runner = dict(type="EpochBasedRunner", max_epochs=150)
