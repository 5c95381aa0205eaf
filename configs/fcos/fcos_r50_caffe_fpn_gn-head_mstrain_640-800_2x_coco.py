# Reference configs/fcos/fcos_r50_caffe_fpn_gn-head_mstrain_640-800_2x_coco.
_base_ = "./fcos_r50_caffe_fpn_gn-head_1x_coco.py"
caffe_img_norm = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False
)
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800),
                                     img_norm=caffe_img_norm)))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
