# 50-epoch variant (reference mask_rcnn_r50_fpn_syncbn-all_rpn-2conv_
# lsj_50e_coco.py: RepeatDataset times=2 over the same 25-epoch runner).
_base_ = "./mask_rcnn_r50_fpn_syncbn-all_rpn-2conv_lsj_100e_coco.py"
data = dict(train=dict(times=2))
