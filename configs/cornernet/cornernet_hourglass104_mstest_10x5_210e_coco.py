# Reference configs/cornernet/cornernet_hourglass104_mstest_10x5_210e_coco.
_base_ = "./cornernet_hourglass104_mstest_8x6_210e_coco.py"
data = dict(samples_per_gpu=5)
