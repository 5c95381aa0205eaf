# Cascade R-CNN R50-FPN on PASCAL VOC 07+12 (reference configs/pascal_voc/
# cascade_rcnn_r50_fpn_1x_voc0712.py).
_base_ = [
    "../_base_/models/cascade_rcnn_r50_fpn.py",
    "../_base_/datasets/voc0712.py",
    "../_base_/default_runtime.py",
]
model = dict(roi_head=dict(bbox_head=dict(num_classes=20)))
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy="step", step=[3])
runner = dict(type="EpochBasedRunner", max_epochs=4)
