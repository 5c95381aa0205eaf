"""Verification drive: the user-facing flow — load the shipping config,
build the detector, train-step it, and run inference — via the public
package surface."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.config import load_config
from boosting_rcnn_tpu.data.loader import FakeDetLoader
from boosting_rcnn_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    step_lr_schedule,
)

# 1. user loads the shipping config
cfg = load_config("configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py")
print("config loaded:", cfg.model.type, "| rpn:", cfg.model.rpn_head.type,
      "| roi:", cfg.model.roi_head.type, "| gamma:", cfg.model.rpn_head.gamma)

# 2. CLI-style override
cfg.merge_from_options({"model.rpn_head.gamma": "1.0"})
assert cfg.model.rpn_head.gamma == 1.0
cfg.merge_from_options({"model.rpn_head.gamma": "0.5"})

# 3. build the full-size detector from the config, shrink for CPU drive
mc = cfg.model.to_dict()
mc["backbone"]["depth"] = 18
mc["backbone"]["base_channels"] = 8
mc["neck"]["in_channels"] = [8, 16, 32, 64]
mc["neck"]["out_channels"] = 32
mc["rpn_head"]["feat_channels"] = 32
mc["rpn_head"]["stacked_convs"] = 2
mc["roi_head"]["bbox_head"]["fc_out_channels"] = 64
mc["train_cfg"]["rpn_proposal"].update(nms_pre=200, max_per_img=100)
mc["test_cfg"]["rpn"].update(nms_pre=100, max_per_img=64)
mc["train_cfg"]["rcnn"]["sampler"]["num"] = 64
det = build_detector(mc)
print("detector built:", type(det).__name__, "rpn_type:", det.rpn_type)

canvas = (128, 160)
variables = det.init(jax.random.PRNGKey(0), canvas)
anchors, nla = det.anchors_for(canvas)

# 4. one optimizer step on a synthetic batch (the training surface)
loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4, num_batches=2)
tx = make_optimizer(step_lr_schedule(0.005, 100), grad_clip_norm=35.0,
                    params=variables["params"], frozen_stages=1)
state = create_train_state(variables, tx)
step = jax.jit(make_train_step(det, anchors, nla))
batches = list(loader.epoch_iter(0))
b0 = {k: jnp.asarray(v) for k, v in batches[0].items() if k != "ori_shape"}
state, metrics = step(state, b0, jax.random.PRNGKey(1))
print("train step:", {k: round(float(v), 4) for k, v in metrics.items()})
assert all(np.isfinite(float(v)) for v in metrics.values())
deltas = jax.tree.map(
    lambda a, b: float(jnp.max(jnp.abs(a - b))), variables["params"], state.params
)
mx = max(jax.tree.leaves(deltas))
assert 0 < mx < 1e-2, f"unexpected update magnitude {mx}"  # lr is in warmup
bb0 = variables["params"]["backbone"]["conv1"]["kernel"]
bb1 = state.params["backbone"]["conv1"]["kernel"]
assert np.allclose(np.asarray(bb0), np.asarray(bb1)), "frozen stem moved"
print(f"params updated (max delta {mx:.2e}), frozen stem fixed ✓")

# 5. inference surface
pred = jax.jit(lambda v, bt: det.predict(v, bt, anchors, nla))
dets, labels, valid = pred({"params": state.params, "batch_stats": state.batch_stats}, b0)
print("predict:", dets.shape, "valid dets:", int(np.asarray(valid).sum()))
dv = np.asarray(dets)[np.asarray(valid)]
assert (dv[:, 4] >= 0.05 - 1e-6).all(), "score_thr violated"
print("score threshold respected ✓")

# 6. probe: empty-GT image (reference edge case, test_forward.py:86-120)
b_empty = dict(b0)
b_empty["gt_mask"] = jnp.zeros_like(b0["gt_mask"])
state2, m2 = step(state, b_empty, jax.random.PRNGKey(2))
print("empty-gt step:", {k: round(float(v), 4) for k, v in m2.items()})
assert all(np.isfinite(float(v)) for v in m2.values()), "empty-gt produced NaN"

# 7. probe: unknown detector type errors clearly
try:
    build_detector({"type": "NoSuchDetector"})
    raise SystemExit("expected KeyError")
except KeyError as e:
    print("unknown detector ->", e)

# 8. probe: config override of a nonexistent nested key creates it (mmcv
# semantics), bad literal stays a string
cfg.merge_from_options({"model.new_key.sub": "3"})
assert cfg.model.new_key.sub == 3
print("VERIFY DRIVE OK")
