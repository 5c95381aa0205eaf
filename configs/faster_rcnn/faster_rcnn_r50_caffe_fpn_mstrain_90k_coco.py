# Reference configs/faster_rcnn/faster_rcnn_r50_caffe_fpn_mstrain_90k_coco:
# the mstrain_1x recipe on an iteration-based 90k schedule (steps at
# 60k/80k), checkpoint/eval every 10k iters.
_base_ = "./faster_rcnn_r50_caffe_fpn_mstrain_1x_coco.py"
lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[60000, 80000],
    by_epoch=False,
)
runner = dict(_delete_=True, type="IterBasedRunner", max_iters=90000)
checkpoint_config = dict(interval=10000)
evaluation = dict(interval=10000, metric="bbox")
