# Reference configs/fcos/fcos_r50_caffe_fpn_gn-head_4x4_1x_coco (4-GPU x 4-img recipe; model identical to the 1x config).
_base_ = "./fcos_r50_caffe_fpn_gn-head_1x_coco.py"
data = dict(samples_per_gpu=4)
