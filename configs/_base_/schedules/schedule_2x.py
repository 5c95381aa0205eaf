# 2x schedule: 24 epochs, step LR at [16, 22] (reference
# configs/_base_/schedules/schedule_2x.py).
optimizer = dict(type="sgd", lr=0.005, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=None)
lr_config = dict(
    policy="step",
    warmup="linear",
    warmup_iters=500,
    warmup_ratio=0.001,
    step=[16, 22],
)
runner = dict(type="EpochBasedRunner", max_epochs=24)
