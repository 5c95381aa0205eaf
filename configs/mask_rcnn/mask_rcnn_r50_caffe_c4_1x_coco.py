# Reference configs/mask_rcnn/mask_rcnn_r50_caffe_c4_1x_coco.
_base_ = [
    "../_base_/models/mask_rcnn_r50_caffe_c4.py",
    "../_base_/datasets/coco_instance.py",
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
