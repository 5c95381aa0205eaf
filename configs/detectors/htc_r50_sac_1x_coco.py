# Reference configs/detectors/htc_r50_sac_1x_coco.
_base_ = "../htc/htc_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        type="DetectoRS_ResNet",
        sac=dict(type="SAC", use_deform=True),
        stage_with_sac=(False, True, True, True),
    ),
)
