# Reference configs/regnet/mask_rcnn_regnetx-3.2GF_fpn_mstrain_3x_coco
# (the non-poly mstrain variant).
_base_ = "./mask_rcnn_regnetx-3.2GF_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
