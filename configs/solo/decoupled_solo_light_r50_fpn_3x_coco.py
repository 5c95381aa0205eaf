# Reference configs/solo/decoupled_solo_light_r50_fpn_3x_coco: the light
# decoupled head (one shared mask tower + per-level x/y output convs) at
# smaller input scales.
_base_ = "./decoupled_solo_r50_fpn_3x_coco.py"
model = dict(
    mask_head=dict(
        type="DecoupledSOLOLightHead",
        stacked_convs=4,
        strides=[8, 8, 16, 32, 32],
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)),
        num_grids=[40, 36, 24, 16, 12],
        cls_down_index=0,
    ),
)
data = dict(
    train=dict(
        pipeline=dict(
            scale=(852, 512), canvas=(512, 864), mstrain_range=(352, 512)
        )
    ),
    val=dict(pipeline=dict(scale=(852, 512), canvas=(512, 864))),
    test=dict(pipeline=dict(scale=(852, 512), canvas=(512, 864))),
)
