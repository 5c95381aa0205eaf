# YOLOv3 DarkNet-53 multi-scale 416 (reference
# configs/yolo/yolov3_d53_mstrain-416_273e_coco.py: same model, smaller
# train/test scale).
_base_ = ["./yolov3_d53_mstrain-608_273e_coco.py"]

data = dict(
    train=dict(
        pipeline=dict(
            scale=(416, 416), canvas=(416, 416), mstrain_range=(320, 416),
        )
    ),
    val=dict(pipeline=dict(scale=(416, 416), canvas=(416, 416))),
    test=dict(pipeline=dict(scale=(416, 416), canvas=(416, 416))),
)
