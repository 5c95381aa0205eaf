# Boosting R-CNN R50-PAFPN multi-scale 2x COCO (reference
# boosting_rcnn_r50_pafpn_mstrain_2x_coco.py: Resize value-mode short side
# 480..800, 24 epochs, step [16, 22]).
_base_ = ["./boosting_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    neck=dict(
        _delete_=True,
        type="PAFPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        start_level=1,
        add_extra_convs="on_output",
        num_outs=5,
    ),
)
data = dict(
    train=dict(
        pipeline=dict(mstrain_range=(480, 800)),
    ),
)
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
