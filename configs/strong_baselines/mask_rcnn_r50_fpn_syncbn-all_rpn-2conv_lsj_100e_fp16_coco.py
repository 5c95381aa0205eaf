# Mixed-precision strong baseline (reference ..._lsj_100e_fp16_coco.py);
# bf16 compute on TPU.
_base_ = "./mask_rcnn_r50_fpn_syncbn-all_rpn-2conv_lsj_100e_coco.py"
compute_dtype = "bfloat16"
fp16 = dict(loss_scale=512.0)
