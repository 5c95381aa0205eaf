# Reference configs/seesaw_loss/mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_normed_mask_mstrain_2x_lvis_v1.
_base_ = "./mask_rcnn_r50_fpn_seesaw_loss_random_2x_lvis_v1.py"
data = dict(train=dict(pipeline=dict(mstrain_range=(640, 800))))
# class-balanced resampling: the base config's
# dataset wrapper switches to oversample_thr=1e-3
data = dict(train=dict(_delete_=True,
    type="ClassBalancedDataset",
    oversample_thr=1e-3,
    dataset=dict(
        type="LVISV1Dataset",
        ann_file="data/lvis_v1/annotations/lvis_v1_train.json",
        img_prefix="data/lvis_v1/",
        pipeline=dict(
            scale=(1333, 800), keep_ratio=True,
            flip_prob=0.5, canvas=(800, 1344),
            max_gt=100, with_masks=True,
            mstrain_range=(640, 800),
        ),
    ),
))
model = dict(roi_head=dict(mask_head=dict(
    predictor_cfg=dict(type="NormedConv2d", tempearture=20))))
