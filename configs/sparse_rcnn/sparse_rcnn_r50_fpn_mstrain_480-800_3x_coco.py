# Reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.
_base_ = "./sparse_rcnn_r50_fpn_1x_coco.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(480, 800))))
lr_config = dict(step=[28, 34])
runner = dict(max_epochs=36)
