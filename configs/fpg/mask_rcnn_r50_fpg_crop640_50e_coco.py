# Reference configs/fpg/mask_rcnn_r50_fpg_crop640_50e_coco.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
model = dict(
    neck=dict(
        _delete_=True,
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
        across_down_trans=dict(type="interpolation_conv", mode="nearest",
                               kernel_size=3),
        across_up_trans=None,
        across_skip_trans=dict(type="conv", kernel_size=1),
        output_trans=dict(type="last_conv", kernel_size=3, order=("act",
                                                                  "conv",
                                                                  "norm")),
        norm_cfg=dict(type="BN", requires_grad=True),
        skip_inds=[(0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ()],
    ),
)
runner = dict(max_epochs=50)
lr_config = dict(step=[30, 40])
