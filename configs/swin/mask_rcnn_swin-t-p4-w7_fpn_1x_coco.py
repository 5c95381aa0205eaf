# Reference configs/swin/mask_rcnn_swin-t-p4-w7_fpn_1x_coco (alias naming of the swin-t 1x recipe).
_base_ = "./mask_rcnn_swin_t_fpn_1x_coco.py"
