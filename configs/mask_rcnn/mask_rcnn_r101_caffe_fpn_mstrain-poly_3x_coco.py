# Reference configs/mask_rcnn/mask_rcnn_r101_caffe_fpn_mstrain-poly_3x_coco.
_base_ = "./mask_rcnn_r50_caffe_fpn_mstrain-poly_3x_coco.py"
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
