# Reference configs/seesaw_loss/cascade_mask_rcnn_r101_fpn_sample1e-3_seesaw_loss_mstrain_2x_lvis_v1.
_base_ = "./cascade_mask_rcnn_r101_fpn_seesaw_loss_random_2x_lvis_v1.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
