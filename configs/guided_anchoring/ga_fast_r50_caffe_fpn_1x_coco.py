# Reference configs/guided_anchoring/ga_fast_r50_caffe_fpn_1x_coco (Fast R-CNN on precomputed GA proposals).
_base_ = "../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x_coco.py"
model = dict(roi_head=dict(bbox_head=dict(
    bbox_coder=dict(target_stds=[0.05, 0.05, 0.1, 0.1]))))
