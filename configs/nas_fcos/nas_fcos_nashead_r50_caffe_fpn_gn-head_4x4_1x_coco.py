# Reference configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.
_base_ = "./nas_fcos_nashead_r50_fpn_4x4_1x_coco.py"
model = dict(
    backbone=dict(
        depth=50,
        style="caffe",
        norm_eval=True,
        init_cfg=dict(
            type="Pretrained",
            checkpoint="open-mmlab://detectron2/resnet50_caffe",
        ),
    ),
)
