# Reference configs/sparse_rcnn/
# sparse_rcnn_r101_fpn_300_proposals_crop_mstrain_480-800_3x_coco.
_base_ = "./sparse_rcnn_r50_fpn_300_proposals_crop_mstrain_480-800_3x_coco.py"
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(type="Pretrained",
                      checkpoint="torchvision://resnet101"),
    ),
)
