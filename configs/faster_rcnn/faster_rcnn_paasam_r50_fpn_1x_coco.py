# Reference configs/faster_rcnn/faster_rcnn_paasam_r50_fpn_1x_coco (fork
# experiment: Faster R-CNN whose RPN assigns by CenterRegionAssigner —
# the FSAF-style scale-aware center sampling — instead of MaxIoU).
_base_ = "./faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    train_cfg=dict(
        rpn=dict(
            assigner=dict(
                _delete_=True,
                type="CenterRegionAssigner",
                pos_scale=0.2,
                neg_scale=0.2,
                min_pos_iof=0.01,
            ),
            sampler=dict(type="RandomSampler", num=256, pos_fraction=0.5,
                         add_gt_as_proposals=False),
        ),
        rpn_proposal=dict(nms_pre=2000, max_per_img=1000,
                          nms=dict(type="nms", iou_threshold=0.7)),
    ),
)
