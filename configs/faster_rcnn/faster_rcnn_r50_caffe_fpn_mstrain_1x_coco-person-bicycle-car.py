# Reference configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_1x_coco-person-bicycle-car.
_base_ = "./faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"
model = dict(roi_head=dict(bbox_head=dict(num_classes=3)))
classes = ("person", "bicycle", "car")
data = dict(
    train=dict(classes=("person", "bicycle", "car")),
    val=dict(classes=("person", "bicycle", "car")),
    test=dict(classes=("person", "bicycle", "car")),
)
