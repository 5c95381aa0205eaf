# Mixed-precision RetinaNet (reference configs/fp16/
# retinanet_r50_fpn_fp16_1x_coco.py); bf16 compute on TPU.
_base_ = "../retinanet/retinanet_r50_fpn_1x_coco.py"
compute_dtype = "bfloat16"
fp16 = dict(loss_scale=512.0)
