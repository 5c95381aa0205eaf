# Reference configs/cascade_rpn/crpn_fast_rcnn_r50_caffe_fpn_1x_coco:
# Fast R-CNN trained on pre-extracted Cascade RPN proposals (300/img),
# high-IoU assigner (0.65) + sharper deltas and 1.5x cls weight.
_base_ = "../fast_rcnn/fast_rcnn_r50_caffe_fpn_1x_coco.py"
model = dict(
    roi_head=dict(
        bbox_head=dict(
            bbox_coder=dict(target_stds=[0.04, 0.04, 0.08, 0.08]),
            loss_cls=dict(type="CrossEntropyLoss", use_sigmoid=False,
                          loss_weight=1.5),
            loss_bbox=dict(_delete_=True, type="SmoothL1Loss", beta=1.0,
                           loss_weight=1.0),
        ),
    ),
    train_cfg=dict(
        rcnn=dict(
            assigner=dict(pos_iou_thr=0.65, neg_iou_thr=0.65,
                          min_pos_iou=0.65),
            sampler=dict(num=256),
        ),
    ),
    test_cfg=dict(rcnn=dict(score_thr=1e-3)),
)
# proposals come from a crpn_r50_caffe_fpn dump (reference LoadProposals
# num_max_proposals=300)
data = dict(
    train=dict(proposal_file="data/coco/proposals/crpn_r50_caffe_fpn_train2017.pkl",
               num_max_proposals=300),
    val=dict(proposal_file="data/coco/proposals/crpn_r50_caffe_fpn_val2017.pkl",
             num_max_proposals=300),
    test=dict(proposal_file="data/coco/proposals/crpn_r50_caffe_fpn_val2017.pkl",
              num_max_proposals=300),
)
