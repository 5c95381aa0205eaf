# Reference configs/yolo/yolov3_mobilenetv2_320_300e_coco.
_base_ = "./yolov3_mobilenetv2_mstrain-416_300e_coco.py"
data = dict(
    train=dict(pipeline=dict(canvas=(320, 320), mstrain_range=None)),
    val=dict(pipeline=dict(canvas=(320, 320))),
    test=dict(pipeline=dict(canvas=(320, 320))),
)
