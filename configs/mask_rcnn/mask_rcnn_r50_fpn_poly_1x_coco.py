# Reference configs/mask_rcnn/mask_rcnn_r50_fpn_poly_1x_coco (polygon mask loading — the loader is polygon-native, so this equals the base 1x recipe).
_base_ = "./mask_rcnn_r50_fpn_1x_coco.py"
