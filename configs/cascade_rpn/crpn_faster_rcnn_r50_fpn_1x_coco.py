# Cascade RPN Faster R-CNN (reference configs/cascade_rpn/
# crpn_faster_rcnn_r50_caffe_fpn_1x_coco.py; FPN-norm variant).
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
    "../_base_/schedules/schedule_1x.py",
]
rpn_weight = 0.7
model = dict(
    type='FasterRCNN',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=1, norm_eval=True),
    neck=dict(
        type='FPN', in_channels=[256, 512, 1024, 2048], out_channels=256,
        num_outs=5),
    rpn_head=dict(
        type='CascadeRPNHead',
        num_stages=2,
        stages=[
            dict(
                type='StageCascadeRPNHead', in_channels=256,
                feat_channels=256,
                anchor_generator=dict(
                    type='AnchorGenerator', scales=[8], ratios=[1.0],
                    strides=[4, 8, 16, 32, 64]),
                adapt_cfg=dict(type='dilation', dilation=3),
                bridged_feature=True, sampling=False, with_cls=False,
                reg_decoded_bbox=True,
                bbox_coder=dict(
                    type='DeltaXYWHBBoxCoder',
                    target_means=(0., 0., 0., 0.),
                    target_stds=(0.1, 0.1, 0.5, 0.5)),
                loss_bbox=dict(type='IoULoss', linear=True,
                               loss_weight=10.0 * rpn_weight)),
            dict(
                type='StageCascadeRPNHead', in_channels=256,
                feat_channels=256,
                adapt_cfg=dict(type='offset'),
                bridged_feature=False, sampling=True, with_cls=True,
                reg_decoded_bbox=True,
                bbox_coder=dict(
                    type='DeltaXYWHBBoxCoder',
                    target_means=(0., 0., 0., 0.),
                    target_stds=(0.05, 0.05, 0.1, 0.1)),
                loss_cls=dict(
                    type='CrossEntropyLoss', use_sigmoid=True,
                    loss_weight=1.0 * rpn_weight),
                loss_bbox=dict(type='IoULoss', linear=True,
                               loss_weight=10.0 * rpn_weight)),
        ]),
    roi_head=dict(
        type='StandardRoIHead',
        bbox_roi_extractor=dict(
            type='SingleRoIExtractor',
            roi_layer=dict(type='RoIAlign', output_size=7,
                           sampling_ratio=0),
            out_channels=256, featmap_strides=[4, 8, 16, 32]),
        bbox_head=dict(
            type='Shared2FCBBoxHead', in_channels=256,
            fc_out_channels=1024, roi_feat_size=7, num_classes=80,
            bbox_coder=dict(
                type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
                target_stds=[0.04, 0.04, 0.08, 0.08]),
            reg_class_agnostic=False,
            loss_cls=dict(
                type='CrossEntropyLoss', use_sigmoid=False,
                loss_weight=1.5),
            loss_bbox=dict(type='SmoothL1Loss', beta=1.0,
                           loss_weight=1.0))),
    train_cfg=dict(
        rpn=[
            dict(
                assigner=dict(
                    type='RegionAssigner', center_ratio=0.2,
                    ignore_ratio=0.5),
                allowed_border=-1),
            dict(
                assigner=dict(
                    type='MaxIoUAssigner', pos_iou_thr=0.7,
                    neg_iou_thr=0.7, min_pos_iou=0.3),
                sampler=dict(
                    type='RandomSampler', num=256, pos_fraction=0.5,
                    add_gt_as_proposals=False)),
        ],
        rpn_proposal=dict(
            nms_pre=2000, max_per_img=300,
            nms=dict(type='nms', iou_threshold=0.8), min_bbox_size=0),
        rcnn=dict(
            assigner=dict(
                type='MaxIoUAssigner', pos_iou_thr=0.65, neg_iou_thr=0.65,
                min_pos_iou=0.65),
            sampler=dict(
                type='RandomSampler', num=256, pos_fraction=0.25,
                add_gt_as_proposals=True))),
    test_cfg=dict(
        rpn=dict(
            nms_pre=1000, max_per_img=300,
            nms=dict(type='nms', iou_threshold=0.8), min_bbox_size=0),
        rcnn=dict(
            score_thr=1e-3, nms=dict(type='nms', iou_threshold=0.5),
            max_per_img=100)))
