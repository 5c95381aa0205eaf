# Reference configs/gn+ws/mask_rcnn_r101_fpn_gn_ws-all_20_23_24e_coco.
_base_ = "./mask_rcnn_r101_fpn_gn_ws-all_2x_coco.py"
lr_config = dict(step=[20, 23])
runner = dict(max_epochs=24)
