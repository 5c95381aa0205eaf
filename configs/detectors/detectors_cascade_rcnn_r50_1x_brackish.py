# Fork variant (reference configs/detectors/
# detectors_cascade_rcnn_r50_1x_brackish.py): same model on Brackish.
_base_ = "./detectors_cascade_rcnn_r50_1x_coco.py"

model = dict(
    roi_head=dict(bbox_head=[
        dict(num_classes=6), dict(num_classes=6), dict(num_classes=6)
    ]))
data = dict(
    train=dict(type='BrackishDataset'),
    val=dict(type='BrackishDataset'),
    test=dict(type='BrackishDataset'))
