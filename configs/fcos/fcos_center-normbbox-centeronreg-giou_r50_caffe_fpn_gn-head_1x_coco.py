# Reference configs/fcos/fcos_center-normbbox-centeronreg-giou_r50_caffe_fpn_gn-head_1x_coco (the FCOS-improvements recipe).
_base_ = "./fcos_r50_caffe_fpn_gn-head_1x_coco.py"
model = dict(
    bbox_head=dict(
        norm_on_bbox=True,
        centerness_on_reg=True,
        center_sampling=True,
        center_sample_radius=1.5,
        loss_bbox=dict(type="GIoULoss", loss_weight=1.0),
    ),
)
