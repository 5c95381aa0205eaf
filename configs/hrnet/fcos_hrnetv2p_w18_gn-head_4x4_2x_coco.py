# Reference configs/hrnet/fcos_hrnetv2p_w18_gn-head_4x4_2x_coco.
_base_ = "./fcos_hrnetv2p_w18_gn-head_4x4_1x_coco.py"
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
