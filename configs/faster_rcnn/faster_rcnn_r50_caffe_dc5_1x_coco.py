# Reference configs/faster_rcnn/faster_rcnn_r50_caffe_dc5_1x_coco
# (DC5: dilated stride-16 C5, no neck, standard Shared2FC RoI head).
_base_ = [
    "../_base_/models/faster_rcnn_r50_caffe_dc5.py",
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
caffe_img_norm = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False
)
data = dict(
    train=dict(pipeline=dict(img_norm=caffe_img_norm)),
    val=dict(pipeline=dict(img_norm=caffe_img_norm)),
    test=dict(pipeline=dict(img_norm=caffe_img_norm)),
)
