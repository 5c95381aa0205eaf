# Reference configs/yolo/yolov3_d53_320_273e_coco.
_base_ = "./yolov3_d53_mstrain-416_273e_coco.py"
data = dict(
    train=dict(pipeline=dict(canvas=(320, 320), mstrain_range=None)),
    val=dict(pipeline=dict(canvas=(320, 320))),
    test=dict(pipeline=dict(canvas=(320, 320))),
)
