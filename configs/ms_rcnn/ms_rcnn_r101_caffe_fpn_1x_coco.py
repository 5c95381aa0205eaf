# Reference configs/ms_rcnn/ms_rcnn_r101_caffe_fpn_1x_coco.
_base_ = "./ms_rcnn_r50_caffe_fpn_1x_coco.py"
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
