# Reference configs/rpn/rpn_r101_caffe_fpn_1x_coco.
_base_ = "./rpn_r50_caffe_fpn_1x_coco.py"
model = dict(backbone=dict(depth=101, init_cfg=dict(
    type="Pretrained",
    checkpoint="open-mmlab://detectron2/resnet101_caffe")))
