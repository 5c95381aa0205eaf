# Reference configs/gn/mask_rcnn_r50_fpn_gn-all_contrib_2x_coco (contributor GN weights — same graph, different pretrained checkpoint).
_base_ = "./mask_rcnn_r50_fpn_gn-all_2x_coco.py"
model = dict(backbone=dict(init_cfg=dict(
    type="Pretrained",
    checkpoint="open-mmlab://contrib/resnet50_gn")))
