# Reference configs/sabl/sabl_retinanet_r101_fpn_gn_2x_ms_480_960_coco.
_base_ = "./sabl_retinanet_r101_fpn_gn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(480, 960))))
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
