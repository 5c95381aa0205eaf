# Reference configs/ensemble/cascade_retinanet_s2_r50_fpn_1x_coco (fork ensemble family:
# a dense first stage + probabilistic cascade R-CNN stages).
_base_ = "../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        type="FPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_input",
        num_outs=5,
    ),
    rpn_head=dict(
        _delete_=True,
        type="RPNHead",
        in_channels=256,
        feat_channels=256,
        num_convs=4,
        anchor_generator=dict(
            type="AnchorGenerator",
            octave_base_scale=4,
            scales_per_octave=3,
            ratios=[0.5, 1.0, 2.0],
            strides=[8, 16, 32, 64, 128],
        ),
        bbox_coder=dict(
            type="DeltaXYWHBBoxCoder",
            target_means=[0.0, 0.0, 0.0, 0.0],
            target_stds=[1.0, 1.0, 1.0, 1.0],
        ),
        loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                      alpha=0.25, loss_weight=0.5),
        loss_bbox=dict(type="L1Loss", loss_weight=1.0),
    ),
    roi_head=dict(
        _delete_=True,
        type="ProbCascadeRoIHead",
        boost=True,
        num_stages=2,
        stage_loss_weights=[1, 0.5],
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[8, 16, 32, 64, 128],
        ),
        bbox_head=[
            dict(
            type="ProbShared2FCBBoxHead",
            in_channels=256,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=4,
            bbox_coder=dict(
                type="DeltaXYWHBBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0],
                target_stds=[0.1, 0.1, 0.2, 0.2],
            ),
            reg_class_agnostic=True,
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
        ),
            dict(
            type="ProbShared2FCBBoxHead",
            in_channels=256,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=4,
            bbox_coder=dict(
                type="DeltaXYWHBBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0],
                target_stds=[0.05, 0.05, 0.1, 0.1],
            ),
            reg_class_agnostic=True,
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
        ),
        ],
    ),
    train_cfg=dict(
        rcnn=[
            dict(
                assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5,
                              min_pos_iou=0.5),
                sampler=dict(type="RandomSampler", num=512,
                             pos_fraction=0.25, add_gt_as_proposals=True),
            ),
            dict(
                assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6,
                              min_pos_iou=0.6),
                sampler=dict(type="RandomSampler", num=512,
                             pos_fraction=0.25, add_gt_as_proposals=True),
            ),
        ],
    ),
)
