# Reference configs/swin/mask_rcnn_swin-s-p4-w7_fpn_fp16_ms-crop-3x_coco.
_base_ = "./mask_rcnn_swin-s-p4-w7_fpn_ms-crop-3x_coco.py"
fp16 = dict(loss_scale=512.0)  # bf16 compute on TPU
