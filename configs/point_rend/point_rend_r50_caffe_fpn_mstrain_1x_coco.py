# Reference configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.
_base_ = "./point_rend_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        style="caffe",
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://detectron2/resnet50_caffe",
        ),
    ),
)
caffe_img_norm = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False
)
data = dict(
    train=dict(pipeline=dict(mstrain_range=(640, 800),
                             img_norm=caffe_img_norm)),
    val=dict(pipeline=dict(img_norm=caffe_img_norm)),
    test=dict(pipeline=dict(img_norm=caffe_img_norm)),
)
