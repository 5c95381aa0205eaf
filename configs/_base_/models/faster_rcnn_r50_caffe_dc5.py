# Reference configs/_base_/models/faster_rcnn_r50_caffe_dc5.py: DC5 —
# 4-stage caffe ResNet with dilated stride-16 C5 (strides 1,2,2,1 /
# dilations 1,1,1,2), no neck, Shared2FC RoI head on the single map.
_base_ = "./faster_rcnn_r50_caffe_c4.py"
model = dict(
    backbone=dict(
        num_stages=4,
        strides=(1, 2, 2, 1),
        dilations=(1, 1, 1, 2),
        out_indices=(3,),
    ),
    rpn_head=dict(in_channels=2048, feat_channels=2048),
    roi_head=dict(
        shared_head=None,
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=2048,
            featmap_strides=[16],
        ),
        bbox_head=dict(
            _delete_=True,
            type="Shared2FCBBoxHead",
            in_channels=2048,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=80,
            bbox_coder=dict(
                type="DeltaXYWHBBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0],
                target_stds=[0.1, 0.1, 0.2, 0.2],
            ),
            reg_class_agnostic=False,
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox=dict(type="L1Loss", loss_weight=1.0),
        ),
    ),
)
