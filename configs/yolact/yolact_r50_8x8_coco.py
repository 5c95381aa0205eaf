# Reference configs/yolact/yolact_r50_8x8_coco (8-GPU recipe: 8x batch, scaled lr).
_base_ = "./yolact_r50_1x8_coco.py"
optimizer = dict(lr=0.008)
data = dict(samples_per_gpu=8)
