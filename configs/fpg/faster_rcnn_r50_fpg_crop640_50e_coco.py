# Faster R-CNN R50 with a Feature Pyramid Grid neck (reference
# configs/fpg/faster_rcnn_r50_fpg_crop640_50e_coco.py: 9 stacked FPG
# stages at 256 channels, crop-640 schedule).
_base_ = ["../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    neck=dict(
        type="FPG",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        inter_channels=256,
        num_outs=5,
        stack_times=9,
        paths=["bu"] * 9,
        same_down_trans=None,
        same_up_trans=dict(type="conv", kernel_size=3, stride=2, padding=1),
        across_lateral_trans=dict(type="conv", kernel_size=1),
        across_down_trans=dict(type="interpolation_conv", mode="nearest"),
        across_up_trans=None,
        across_skip_trans=dict(type="conv", kernel_size=1),
        output_trans=dict(type="last_conv", kernel_size=3, order=("act", "conv", "norm")),
        start_level=0,
        stage_with_output_convs=(False, False, False, False, False, False, False, False, True),
    )
)

data = dict(
    train=dict(pipeline=dict(scale=(640, 640), canvas=(640, 640))),
    val=dict(pipeline=dict(scale=(640, 640), canvas=(640, 640))),
    test=dict(pipeline=dict(scale=(640, 640), canvas=(640, 640))),
)

lr_config = dict(step=[30, 40])
runner = dict(max_epochs=50)
