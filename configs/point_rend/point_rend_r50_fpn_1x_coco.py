# PointRend R50-FPN 1x COCO (reference
# configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py values:
# CoarseMaskHead 2fc 7x7 + MaskPointHead 3fc, 196 train points with 3x
# oversampling / 0.75 importance, 5 x2 subdivision steps at test).
_base_ = ["../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"]

model = dict(
    type="PointRend",
    roi_head=dict(
        type="PointRendRoIHead",
        mask_head=dict(
            _delete_=True,
            type="CoarseMaskHead",
            num_fcs=2,
            in_channels=256,
            conv_out_channels=256,
            fc_out_channels=1024,
            num_classes=80,
            roi_feat_size=14,
            downsample_factor=2,
        ),
        point_head=dict(
            type="MaskPointHead",
            num_fcs=3,
            in_channels=256,
            fc_channels=256,
            num_classes=80,
            coarse_pred_each_layer=True,
        ),
    ),
    train_cfg=dict(
        rcnn=dict(
            point=dict(
                num_points=196,
                oversample_ratio=3,
                importance_sample_ratio=0.75,
            ),
        ),
    ),
    test_cfg=dict(
        rcnn=dict(
            subdivision_steps=5,
            subdivision_num_points=784,
            scale_factor=2,
        ),
    ),
)
