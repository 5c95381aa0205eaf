# InstaBoost Cascade Mask R-CNN (reference configs/instaboost/
# cascade_mask_rcnn_r50_fpn_instaboost_4x_coco.py).  Cascade R-CNN model
# base + mask branch + the instaboost-gated pipeline.
_base_ = "../cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py"
model = dict(
    type="CascadeRCNN",
    roi_head=dict(
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
        mask_head=dict(
            type="FCNMaskHead",
            num_convs=4,
            in_channels=256,
            conv_out_channels=256,
            num_classes=80,
            loss_mask=dict(type="CrossEntropyLoss", use_mask=True,
                           loss_weight=1.0),
        ),
    ),
)
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    instaboost=dict(aug_ratio=0.5),
)
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[32, 44])
runner = dict(type="EpochBasedRunner", max_epochs=48)
