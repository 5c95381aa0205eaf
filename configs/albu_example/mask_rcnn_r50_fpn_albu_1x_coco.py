# Albumentations-augmented Mask R-CNN (reference configs/albu_example/
# mask_rcnn_r50_fpn_albu_1x_coco.py).  The albu transform chain runs on
# the NATIVE implementations in data/albu.py (the third-party
# ``albumentations`` package is not available here); unknown transform
# types raise at apply time.
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    albu=dict(
        transforms=[
            dict(type="ShiftScaleRotate", shift_limit=0.0625,
                 scale_limit=0.0, rotate_limit=0, p=0.5),
            dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
                 contrast_limit=[0.1, 0.3], p=0.2),
            dict(type="ChannelShuffle", p=0.1),
            dict(type="OneOf", transforms=[
                dict(type="Blur", blur_limit=3, p=1.0),
                dict(type="MedianBlur", blur_limit=3, p=1.0)], p=0.1),
        ],
    ),
)
data = dict(train=dict(pipeline=train_pipeline))
