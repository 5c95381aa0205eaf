# Reference configs/detectors/cascade_rcnn_r50_sac_1x_coco (SAC only, no RFP).
_base_ = "../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    backbone=dict(
        type="DetectoRS_ResNet",
        sac=dict(type="SAC", use_deform=True),
        stage_with_sac=(False, True, True, True),
    ),
)
