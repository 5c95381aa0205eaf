# Probabilistic Cascade R-CNN with the boosting RPN (the reference's
# configs/ensemble family: ProbCascadeRoIHead + ProbShared2FCBBoxHead
# stages fused with the proposal prior at test).
_base_ = ["../boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py"]

_stage_head = dict(
    type="ProbShared2FCBBoxHead",
    num_shared_fcs=2,
    in_channels=256,
    fc_out_channels=1024,
    roi_feat_size=7,
    num_classes=4,
    bbox_coder=dict(
        target_means=[0.0, 0.0, 0.0, 0.0],
        target_stds=[0.1, 0.1, 0.2, 0.2],
    ),
    reg_class_agnostic=True,
    loss_cls=dict(type="CrossEntropyLoss", loss_weight=1.0),
    loss_bbox=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1.0),
)

model = dict(
    type="CascadeRCNN",
    roi_head=dict(
        _delete_=True,
        type="ProbCascadeRoIHead",
        boost=True,
        gamma=0.5,
        num_stages=3,
        stage_loss_weights=[1, 0.5, 0.25],
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[8, 16, 32, 64, 128],
        ),
        bbox_head=[_stage_head, _stage_head, _stage_head],
    ),
    train_cfg=dict(
        rcnn=[
            dict(
                assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5),
                sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                             add_gt_as_proposals=True),
            ),
            dict(
                assigner=dict(pos_iou_thr=0.6, neg_iou_thr=0.6, min_pos_iou=0.6),
                sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                             add_gt_as_proposals=True),
            ),
            dict(
                assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.7, min_pos_iou=0.7),
                sampler=dict(type="RandomSampler", num=512, pos_fraction=0.25,
                             add_gt_as_proposals=True),
            ),
        ],
    ),
)
