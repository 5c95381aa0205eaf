# Reference configs/cornernet/cornernet_hourglass104_mstest_32x3_210e_coco.
_base_ = "./cornernet_hourglass104_mstest_8x6_210e_coco.py"
data = dict(samples_per_gpu=3)
