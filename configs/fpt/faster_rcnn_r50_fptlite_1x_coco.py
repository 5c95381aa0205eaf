# Reference configs/fpt/faster_rcnn_r50_fptlite_1x_coco (fork FPT_lite: FPN with cross-attention top-down fusion).
_base_ = "../faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        _delete_=True,
        type="FPT_lite",
        in_channels=[256, 512, 1024, 2048],
        out_channels=256,
        num_outs=5,
    ),
)
