# Reference configs/seesaw_loss/cascade_mask_rcnn_r101_fpn_seesaw_loss_random_2x_lvis_v1.
_base_ = [
    "../cascade_rcnn/cascade_mask_rcnn_r101_fpn_1x_coco.py",
    "../_base_/datasets/lvis_v1_instance.py",
]
model = dict(
    roi_head=dict(
        bbox_head=[
            dict(num_classes=1203,
                 loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0,
                               loss_weight=1.0)),
            dict(num_classes=1203,
                 loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0,
                               loss_weight=1.0)),
            dict(num_classes=1203,
                 loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0,
                               loss_weight=1.0)),
        ],
        mask_head=dict(num_classes=1203),
    ),
    test_cfg=dict(rcnn=dict(score_thr=0.0001, max_per_img=300)),
)
lr_config = dict(step=[16, 22])
runner = dict(max_epochs=24)
