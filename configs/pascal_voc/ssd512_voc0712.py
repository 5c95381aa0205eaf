# SSD512 on PASCAL VOC 07+12 (reference configs/pascal_voc/ssd512_voc0712.py:
# 512 input, 7-level extras with last kernel 4, ratio range (0.15, 0.9)).
_base_ = "./ssd300_voc0712.py"
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
            basesize_ratio_range=(0.15, 0.9),
            strides=[8, 16, 32, 64, 128, 256, 512],
            ratios=[[2], [2, 3], [2, 3], [2, 3], [2, 3], [2], [2]],
        ),
    ),
)
train_pipeline = dict(
    scale=(512, 512), keep_ratio=False, flip_prob=0.5,
    canvas=(512, 512), max_gt=100,
    ssd_aug=True,
)
data = dict(train=dict(pipeline=train_pipeline))
