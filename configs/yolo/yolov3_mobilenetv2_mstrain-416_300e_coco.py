# Reference configs/yolo/yolov3_mobilenetv2_mstrain-416_300e_coco.
_base_ = "./yolov3_d53_mstrain-416_273e_coco.py"
model = dict(
    backbone=dict(
        _delete_=True,
        type="MobileNetV2",
        out_indices=(2, 4, 6),
        init_cfg=dict(
            type="Pretrained", checkpoint="open-mmlab://mmdet/mobilenet_v2"
        ),
    ),
    neck=dict(in_channels=[320, 96, 32]),
)
runner = dict(max_epochs=300)
