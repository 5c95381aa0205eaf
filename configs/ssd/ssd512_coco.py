# SSD512 COCO (reference configs/ssd/ssd512_coco.py: 512 input, 7-level
# extras with last kernel 4, basesize_ratio_range (0.1, 0.9)).
_base_ = "./ssd300_coco.py"
model = dict(
    neck=dict(
        out_channels=(512, 1024, 512, 256, 256, 256, 256),
        level_strides=(2, 2, 2, 2, 1),
        level_paddings=(1, 1, 1, 1, 1),
        last_kernel_size=4,
    ),
    bbox_head=dict(
        in_channels=(512, 1024, 512, 256, 256, 256, 256),
        anchor_generator=dict(
            input_size=512,
            basesize_ratio_range=(0.1, 0.9),
            strides=[8, 16, 32, 64, 128, 256, 512],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]],
        ),
    ),
)
data = dict(
    train=dict(pipeline=dict(scale=(512, 512), keep_ratio=False,
                             canvas=(512, 512), ssd_aug=True)),
    val=dict(pipeline=dict(scale=(512, 512), keep_ratio=False, canvas=(512, 512))),
    test=dict(pipeline=dict(scale=(512, 512), keep_ratio=False, canvas=(512, 512))),
)
