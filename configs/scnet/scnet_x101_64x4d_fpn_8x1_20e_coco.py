# Reference configs/scnet/scnet_x101_64x4d_fpn_8x1_20e_coco.
_base_ = "./scnet_x101_64x4d_fpn_20e_coco.py"
data = dict(samples_per_gpu=1)
optimizer = dict(lr=0.01)
