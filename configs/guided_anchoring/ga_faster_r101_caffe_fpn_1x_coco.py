# Reference configs/guided_anchoring/ga_faster_r101_caffe_fpn_1x_coco.
_base_ = "./ga_faster_r50_fpn_1x_coco.py"
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
