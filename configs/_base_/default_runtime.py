checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
custom_hooks = [dict(type="NumClassCheckHook")]
log_level = "INFO"
load_from = None
resume_from = None
workflow = [("train", 1)]
# TPU runtime knobs (no NCCL analog needed: collectives are compiled into the
# jitted step over the device mesh).
compute_dtype = "bfloat16"
