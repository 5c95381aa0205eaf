"""Training hooks (the reference's ``mmdet/core/hook`` suite, re-expressed
for a functional train loop).

  * EMA (``core/hook/ema.py``): exponential moving average of params as a
    pure update folded into the train step.
  * CheckInvalidLossHook (``checkloss_hook.py:6-24``): implemented in
    ``tools/train.py`` as a periodic finite-loss assertion.
  * NumClassCheckHook (``default_runtime.py:10``): ``check_num_classes``.
  * DistSamplerSeedHook / SyncRandomSizeHook: epoch seeding and multi-scale
    jitter are deterministic functions of (seed, epoch) in the loader, so no
    broadcast is needed — every host derives the same values.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


def ema_init(params):
    return jax.tree.map(lambda x: x.astype(jnp.float32), params)


def ema_update(ema_params, params, momentum=0.0002):
    """``ema = (1 - m) * ema + m * p`` (reference BaseEMAHook update;
    ``momentum`` may be a python float or a traced per-step value from
    :func:`exp_momentum_schedule`)."""
    return jax.tree.map(
        lambda e, p: (1.0 - momentum) * e + momentum * p.astype(jnp.float32),
        ema_params,
        params,
    )


def exp_momentum_schedule(total_iter: int = 2000, momentum: float = 0.0002):
    """Reference ``ExpMomentumEMAHook`` (``core/hook/ema.py:104``):
    ``m(t) = (1 - momentum) * exp(-(1 + t) / total_iter) + momentum`` —
    near-1 momentum early (EMA tracks params quickly) decaying to the
    steady-state ``momentum``.  Returns a callable over the step index."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        return (1.0 - momentum) * jnp.exp(
            -(1.0 + step) / total_iter) + momentum

    return fn


def check_num_classes(model_cfg: Dict[str, Any], dataset) -> None:
    """NumClassCheckHook: dataset class count must match head config."""
    if "roi_head" in model_cfg:
        bh = model_cfg["roi_head"]["bbox_head"]
        nc = (bh[0] if isinstance(bh, list) else bh)["num_classes"]
    elif "bbox_head" in model_cfg:
        nc = model_cfg["bbox_head"]["num_classes"]
    else:
        return
    ds_nc = len(dataset.CLASSES)
    if nc != ds_nc:
        raise ValueError(
            f"model num_classes ({nc}) != dataset classes ({ds_nc}): "
            f"{dataset.CLASSES}"
        )
