# Reference configs/cascade_rcnn/cascade_mask_rcnn_r50_caffe_fpn_mstrain_3x_coco.
_base_ = "./cascade_mask_rcnn_r50_caffe_fpn_1x_coco.py"
caffe_img_norm = dict(
    mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0], to_rgb=False
)
data = dict(train=dict(pipeline=dict(
    mstrain_range=(640, 800), with_masks=True,
    img_norm=caffe_img_norm,
)))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
