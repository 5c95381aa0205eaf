# Reference configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_trashcanins
# (fork contribution: TrashCan instance-version split, 22 classes,
# bbox-only cascade).
_base_ = [
    "../_base_/models/cascade_rcnn_r50_fpn.py",
    "../_base_/datasets/trashcan_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
_stds = ([0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
         [0.033, 0.033, 0.067, 0.067])
model = dict(
    roi_head=dict(
        bbox_head=[
            dict(
                type="Shared2FCBBoxHead",
                num_shared_fcs=2,
                in_channels=256,
                fc_out_channels=1024,
                roi_feat_size=7,
                num_classes=22,
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
)
