# Reference configs/strong_baselines/mask_rcnn_r50_caffe_fpn_syncbn-all_rpn-2conv_lsj_100e_fp16_coco.
_base_ = "./mask_rcnn_r50_fpn_syncbn-all_rpn-2conv_lsj_100e_coco.py"
model = dict(
    backbone=dict(
        style="caffe",
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
    train=dict(pipeline=dict(img_norm=caffe_img_norm)),
    val=dict(pipeline=dict(img_norm=caffe_img_norm)),
    test=dict(pipeline=dict(img_norm=caffe_img_norm)),
)
fp16 = dict(loss_scale=512.0)  # bf16 compute on TPU
