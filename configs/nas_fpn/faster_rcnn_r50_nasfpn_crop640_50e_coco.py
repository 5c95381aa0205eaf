# Reference configs/nas_fpn/faster_rcnn_r50_nasfpn_crop640_50e_coco (fork variant: NAS-FPN under the two-stage detector).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        _delete_=True,
        type="NASFPN",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
        stack_times=7,
        start_level=0,
    ),
)
runner = dict(max_epochs=50)
lr_config = dict(step=[30, 40])
