# InstaBoost Mask R-CNN (reference configs/instaboost/
# mask_rcnn_r50_fpn_instaboost_4x_coco.py: 48 epochs, step [32, 44]).
# The instaboost jitter-paste runs on the native matting-free
# implementation in data/instaboost.py (the third-party
# ``instaboostfast`` package is absent here).
_base_ = "../mask_rcnn/mask_rcnn_r50_fpn_1x_coco.py"
train_pipeline = dict(
    scale=(1333, 800), keep_ratio=True, flip_prob=0.5,
    canvas=(800, 1344), max_gt=100, with_masks=True,
    instaboost=dict(action_candidate=("normal", "horizontal", "skip"),
                    action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                    theta=(-1, 1), color_prob=0.5, hflag=False,
                    aug_ratio=0.5),
)
data = dict(train=dict(pipeline=train_pipeline))
lr_config = dict(step=[32, 44])
runner = dict(type="EpochBasedRunner", max_epochs=48)
