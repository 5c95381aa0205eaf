# PAA R50-FPN 1x COCO (reference configs/paa/paa_r50_fpn_1x_coco.py:
# probabilistic anchor assignment over the ATSS head, score voting).
_base_ = ["../atss/atss_r50_fpn_1x_coco.py"]

model = dict(
    type="PAA",
    bbox_head=dict(
        type="PAAHead",
        loss_bbox=dict(type="GIoULoss", loss_weight=1.3),
        loss_centerness=dict(
            type="CrossEntropyLoss", use_sigmoid=True, loss_weight=0.5
        ),
    ),
    train_cfg=dict(
        assigner=dict(
            type="MaxIoUAssigner",
            pos_iou_thr=0.1,
            neg_iou_thr=0.1,
            min_pos_iou=0,
            ignore_iof_thr=-1,
        ),
        topk=9,
    ),
    test_cfg=dict(score_voting=True),
)
