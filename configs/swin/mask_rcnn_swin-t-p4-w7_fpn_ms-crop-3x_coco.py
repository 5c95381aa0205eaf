# Reference configs/swin/mask_rcnn_swin-t-p4-w7_fpn_ms-crop-3x_coco.
_base_ = "./mask_rcnn_swin_t_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(480, 800))))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
