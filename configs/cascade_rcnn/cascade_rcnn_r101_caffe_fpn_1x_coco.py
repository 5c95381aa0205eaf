# Reference configs/cascade_rcnn/cascade_rcnn_r101_caffe_fpn_1x_coco.
_base_ = "./cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        style="caffe",
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://detectron2/resnet101_caffe",
        ),
    ),
)
caffe_img_norm = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False
)
data = dict(
    train=dict(pipeline=dict(img_norm=caffe_img_norm)),
    val=dict(pipeline=dict(img_norm=caffe_img_norm)),
    test=dict(pipeline=dict(img_norm=caffe_img_norm)),
)
