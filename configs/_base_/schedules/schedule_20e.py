# 20-epoch schedule, step LR at [16, 19] (reference
# configs/_base_/schedules/schedule_20e.py; the cascade-family default).
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[16, 19],
)
runner = dict(type="EpochBasedRunner", max_epochs=20)
