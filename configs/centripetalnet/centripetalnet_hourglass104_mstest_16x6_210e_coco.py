# CentripetalNet HourglassNet-104 (reference configs/centripetalnet/
# centripetalnet_hourglass104_mstest_16x6_210e_coco.py: CornerNet base with
# guiding/centripetal shift branches instead of associative embedding).
_base_ = ["../cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py"]

model = dict(
    type="CentripetalNet",
    bbox_head=dict(
        type="CentripetalHead",
        num_classes=80,
        in_channels=256,
        num_feat_levels=2,
        corner_emb_channels=0,  # no embedding branch
        loss_heatmap=dict(
            type="GaussianFocalLoss", alpha=2.0, gamma=4.0, loss_weight=1
        ),
        loss_embedding=None,
        loss_offset=dict(type="SmoothL1Loss", beta=1.0, loss_weight=1),
        loss_guiding_shift=dict(type="SmoothL1Loss", beta=1.0, loss_weight=0.05),
        loss_centripetal_shift=dict(
            type="SmoothL1Loss", beta=1.0, loss_weight=1
        ),
    ),
)
optimizer = dict(type="Adam", lr=0.0005)
