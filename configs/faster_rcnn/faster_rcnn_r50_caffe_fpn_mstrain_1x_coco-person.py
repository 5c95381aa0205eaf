# Reference configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person.
_base_ = "./faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"
model = dict(roi_head=dict(bbox_head=dict(num_classes=1)))
classes = ("person",)
data = dict(
    train=dict(classes=("person",)),
    val=dict(classes=("person",)),
    test=dict(classes=("person",)),
)
