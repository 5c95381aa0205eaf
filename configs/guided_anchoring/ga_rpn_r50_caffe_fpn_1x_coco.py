# Reference configs/guided_anchoring/ga_rpn_r50_caffe_fpn_1x_coco.
_base_ = "./ga_rpn_r50_fpn_1x_coco.py"
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
