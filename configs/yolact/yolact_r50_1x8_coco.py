# YOLACT-550 (reference configs/yolact/yolact_r50_1x8_coco.py)
_base_ = [
    "../_base_/datasets/coco_detection.py",
    "../_base_/default_runtime.py",
]
img_size = 550
model = dict(
    type='YOLACT',
    backbone=dict(
        type='ResNet', depth=50, num_stages=4, out_indices=(0, 1, 2, 3),
        frozen_stages=-1, norm_eval=False),
    neck=dict(
        type='FPN', in_channels=[256, 512, 1024, 2048], out_channels=256,
        start_level=1, add_extra_convs='on_input', num_outs=5,
        relu_before_extra_convs=True),
    bbox_head=dict(
        type='YOLACTHead', num_classes=80, in_channels=256,
        feat_channels=256, num_head_convs=1, num_protos=32,
        use_ohem=True,
        anchor_generator=dict(
            type='AnchorGenerator', octave_base_scale=3,
            scales_per_octave=1, base_sizes=[8, 16, 32, 64, 128],
            ratios=[0.5, 1.0, 2.0], strides=[550.0 / x
                                             for x in [69, 35, 18, 9, 5]],
            centers=[(550 * 0.5 / x, 550 * 0.5 / x)
                     for x in [69, 35, 18, 9, 5]]),
        bbox_coder=dict(
            type='DeltaXYWHBBoxCoder', target_means=[0., 0., 0., 0.],
            target_stds=[0.1, 0.1, 0.2, 0.2]),
        loss_cls=dict(
            type='CrossEntropyLoss', use_sigmoid=False, reduction='none',
            loss_weight=1.0),
        loss_bbox=dict(type='SmoothL1Loss', beta=1.0, loss_weight=1.5)),
    mask_head=dict(
        type='YOLACTProtonet', in_channels=256, num_protos=32,
        num_classes=80, max_masks_to_train=100, loss_mask_weight=6.125),
    segm_head=dict(
        type='YOLACTSegmHead', num_classes=80, in_channels=256,
        loss_segm=dict(
            type='CrossEntropyLoss', use_sigmoid=True, loss_weight=1.0)),
    train_cfg=dict(
        assigner=dict(
            type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
            min_pos_iou=0., ignore_iof_thr=-1, gt_max_assign_all=False),
        sampler=dict(type='PseudoSampler', neg_pos_ratio=3),
        smoothl1_beta=1., allowed_border=-1, pos_weight=-1, debug=False),
    test_cfg=dict(
        nms_pre=1000, min_bbox_size=0, score_thr=0.05, iou_thr=0.5,
        top_k=200, max_per_img=100))
