# Reference configs/cascade_rcnn/cascade_mask_rcnn_r50_fpn_mstrain_3x_coco.
_base_ = "./cascade_mask_rcnn_r50_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800), with_masks=True)))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
