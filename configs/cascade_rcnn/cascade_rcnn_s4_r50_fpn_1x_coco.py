# Reference configs/cascade_rcnn/cascade_rcnn_s4_r50_fpn_1x_coco (fork
# contribution: FOUR-stage cascade with IoU thresholds 0.5/0.6/0.7/0.8 on
# UTDAC, 4 classes; despite the filename the dataset base is UTDAC-coco).
_base_ = [
    "../_base_/models/cascade_rcnn_r50_fpn.py",
    "../_base_/datasets/utdac_detection_coco.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
_stds = ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
         [0.033, 0.033, 0.067, 0.067], [0.017, 0.017, 0.033, 0.033])
_thrs = (0.5, 0.6, 0.7, 0.8)
model = dict(
    rpn_head=dict(
        loss_bbox=dict(_delete_=True, type="SmoothL1Loss", beta=1.0 / 9.0,
                       loss_weight=1.0),
    ),
    roi_head=dict(
        num_stages=4,
        stage_loss_weights=[1, 0.5, 0.25, 0.125],
        bbox_head=[
            dict(
                type="Shared2FCBBoxHead",
                num_shared_fcs=2,
                in_channels=256,
                fc_out_channels=1024,
                roi_feat_size=7,
                num_classes=4,
                bbox_coder=dict(
                    type="DeltaXYWHBBoxCoder",
                    target_means=[0.0, 0.0, 0.0, 0.0],
                    target_stds=s,
                ),
                reg_class_agnostic=True,
                loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                              loss_weight=1.0),
                loss_bbox=dict(type="SmoothL1Loss", beta=1.0,
                               loss_weight=1.0),
            )
            for s in _stds
        ],
    ),
    train_cfg=dict(
        rpn_proposal=dict(nms_pre=2000, max_per_img=2000,
                          nms=dict(type="nms", iou_threshold=0.7)),
        rcnn=[
            dict(
                assigner=dict(
                    type="MaxIoUAssigner",
                    pos_iou_thr=t, neg_iou_thr=t, min_pos_iou=t,
                    match_low_quality=False,
                ),
                sampler=dict(type="RandomSampler", num=512,
                             pos_fraction=0.25, add_gt_as_proposals=True),
            )
            for t in _thrs
        ],
    ),
    test_cfg=dict(
        rpn=dict(nms_pre=1000, max_per_img=1000,
                 nms=dict(type="nms", iou_threshold=0.7)),
        rcnn=dict(score_thr=0.05, nms=dict(type="nms", iou_threshold=0.5),
                  max_per_img=100),
    ),
)
