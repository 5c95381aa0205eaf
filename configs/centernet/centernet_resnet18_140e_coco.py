# CenterNet ResNet-18 140e COCO (reference configs/centernet values).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]

model = dict(
    type="CenterNet",
    backbone=dict(
        type="ResNet",
        depth=18,
        num_stages=4,
        out_indices=(3,),
        norm_eval=False,
        init_cfg=dict(type="Pretrained", checkpoint="torchvision://resnet18"),
    ),
    neck=dict(
        type="CTResNetNeck",
        in_channel=512,
        num_deconv_filters=(256, 128, 64),
        num_deconv_kernels=(4, 4, 4),
    ),
    bbox_head=dict(
        type="CenterNetHead",
        num_classes=80,
        in_channel=64,
        feat_channel=64,
        loss_center_heatmap=dict(type="GaussianFocalLoss", loss_weight=1.0),
        loss_wh=dict(type="L1Loss", loss_weight=0.1),
        loss_offset=dict(type="L1Loss", loss_weight=1.0),
    ),
    train_cfg=None,
    test_cfg=dict(topk=100, local_maximum_kernel=3, max_per_img=100),
)
optimizer = dict(lr=0.02)
