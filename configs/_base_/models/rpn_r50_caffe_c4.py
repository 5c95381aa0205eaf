# Reference configs/_base_/models/rpn_r50_caffe_c4.py: RPN-only over the
# stride-16 C4 caffe backbone (the faster_rcnn C4 model minus RoI head).
_base_ = "./faster_rcnn_r50_caffe_c4.py"
model = dict(type="RPN", roi_head=None)
