# Mixed-precision Faster R-CNN (reference configs/fp16/
# faster_rcnn_r50_fpn_fp16_1x_coco.py).  On TPU the fp16+loss-scale recipe
# maps to bfloat16 compute (same dynamic range as f32 -> no loss scaling
# needed); params/optimizer state stay f32.
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
compute_dtype = "bfloat16"
fp16 = dict(loss_scale=512.0)  # recorded for parity; unused on TPU
