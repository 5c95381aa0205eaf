# Reference configs/yolo/yolov3_d53_fp16_mstrain-608_273e_coco (fp16 realized as bf16 on TPU, as configs/fp16).
_base_ = "./yolov3_d53_mstrain-608_273e_coco.py"
fp16 = dict(loss_scale=512.0)  # bf16 compute on TPU
