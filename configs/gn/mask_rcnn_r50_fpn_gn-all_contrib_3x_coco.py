# Reference configs/gn/mask_rcnn_r50_fpn_gn-all_contrib_3x_coco (contributor GN weights — same graph, different pretrained checkpoint).
_base_ = "./mask_rcnn_r50_fpn_gn-all_2x_coco.py"
model = dict(backbone=dict(init_cfg=dict(
    type="Pretrained",
    checkpoint="open-mmlab://contrib/resnet50_gn")))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
