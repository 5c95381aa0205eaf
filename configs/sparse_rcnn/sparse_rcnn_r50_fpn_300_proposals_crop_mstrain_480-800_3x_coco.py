# Reference configs/sparse_rcnn/sparse_rcnn_r50_fpn_300_proposals_crop_mstrain_480-800_3x_coco.
_base_ = "./sparse_rcnn_r50_fpn_mstrain_480-800_3x_coco.py"
model = dict(rpn_head=dict(num_proposals=300),
             test_cfg=dict(max_per_img=300))
