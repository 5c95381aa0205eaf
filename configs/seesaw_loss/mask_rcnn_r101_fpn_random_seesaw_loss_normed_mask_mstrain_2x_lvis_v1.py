# Reference configs/seesaw_loss/mask_rcnn_r101_fpn_random_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.
_base_ = "./mask_rcnn_r50_fpn_seesaw_loss_random_2x_lvis_v1.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
model = dict(
    backbone=dict(
        depth=101,
        init_cfg=dict(
            type="Pretrained", checkpoint="torchvision://resnet101"
        ),
    ),
)
model = dict(roi_head=dict(mask_head=dict(
    predictor_cfg=dict(type="NormedConv2d", tempearture=20))))
