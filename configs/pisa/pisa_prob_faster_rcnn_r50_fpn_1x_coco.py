# Reference configs/pisa/pisa_prob_faster_rcnn_r50_fpn_1x_coco (fork
# experiment: ATSS-RPN proposals feeding a ProbPISARoIHead —
# reference pisa_roi_head.py:163 — PISA ISR-P/CARL training with the
# boosting prior fusion at test; num_classes=4 as shipped upstream).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
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
        type="ATSSRPNHead",
        in_channels=256,
        feat_channels=256,
        stacked_convs=4,
        reg_decoded_bbox=True,
        gamma=3,
        atss=False,
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
                      alpha=0.25, loss_weight=1.0),
        loss_centerness=dict(type="CrossEntropyLoss", use_sigmoid=True,
                             loss_weight=1.0),
        loss_bbox=dict(_delete_=True, type="GIoULoss", loss_weight=4.0),
    ),
    roi_head=dict(
        type="ProbPISARoIHead",
        bbox_roi_extractor=dict(
            type="SingleRoIExtractor",
            roi_layer=dict(type="RoIAlign", output_size=7,
                           sampling_ratio=0),
            out_channels=256,
            featmap_strides=[8, 16, 32, 64, 128],
        ),
        bbox_head=dict(
            _delete_=True,
            type="ProbConvFCBBoxHead",
            num_shared_fcs=2,
            in_channels=256,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=4,
            bbox_coder=dict(
                type="DeltaXYWHBBoxCoder",
                target_means=[0.0, 0.0, 0.0, 0.0],
                target_stds=[0.1, 0.1, 0.2, 0.2],
            ),
            reg_class_agnostic=False,
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=1.0),
            loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                           loss_weight=1.0),
        ),
    ),
    train_cfg=dict(
        rpn=dict(
            assigner=dict(
                pos_iou_thr=0.5, neg_iou_thr=0.4, min_pos_iou=0,
                match_low_quality=True,
            ),
            sampler=dict(_delete_=True, type="PseudoSampler"),
        ),
        rpn_proposal=dict(nms_pre=2000, max_per_img=2000,
                          nms=dict(type="nms", iou_threshold=0.7)),
        rcnn=dict(
            sampler=dict(
                type="ScoreHLRSampler",
                num=512,
                pos_fraction=0.25,
                add_gt_as_proposals=True,
                k=0.5,
                bias=0.0,
            ),
            isr=dict(k=2, bias=0),
            carl=dict(k=1, bias=0.2),
        ),
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=2000, max_per_img=2000,
                 nms=dict(type="nms", iou_threshold=0.7)),
    ),
)
