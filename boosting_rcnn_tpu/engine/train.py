"""Training engine: optimizer, LR schedule, jitted train step, data-parallel
sharding.

Collapses the reference's L5 runtime (mmcv ``EpochBasedRunner`` +
``OptimizerHook``/LR hooks + ``MMDistributedDataParallel``, consumed at
``mmdet/apis/train.py:38-174``) into one pure ``train_step(state, batch,
rng) -> (state, metrics)`` jitted over a 1-D data mesh: gradient averaging,
loss-normaliser reduction and log-var reduction all become XLA collectives
chosen by the sharding (reference NCCL usage inventory: SURVEY.md §2.4).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..models.backbones.resnet import resnet_param_prefixes_for_stage


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def step_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs=(8, 11),
    gamma: float = 0.1,
    warmup_iters: int = 500,
    warmup_ratio: float = 0.001,
):
    """Step decay at epoch boundaries + linear warmup (reference
    ``lr_config`` in schedule_1x)."""

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = step / steps_per_epoch
        decay = jnp.asarray(1.0)
        for e in decay_epochs:
            decay = decay * jnp.where(epoch >= e, gamma, 1.0)
        warm_frac = jnp.minimum(step / max(warmup_iters, 1), 1.0)
        warm = warmup_ratio + (1.0 - warmup_ratio) * warm_frac
        return base_lr * decay * warm

    return sched


def yolox_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    max_epochs: int,
    num_last_epochs: int = 15,
    min_lr_ratio: float = 0.05,
    warmup_epochs: int = 5,
    warmup_ratio: float = 1.0,
):
    """Reference ``YOLOXLrUpdaterHook`` (``core/hook/yolox_lrupdater_hook.py``):
    quadratic exp warmup over ``warmup_epochs``, cosine anneal to
    ``min_lr_ratio * base_lr`` until ``max_epochs - num_last_epochs``, then
    a fixed floor for the final (mosaic-free) epochs."""
    warmup_iters = max(warmup_epochs * steps_per_epoch, 1)
    total = max_epochs * steps_per_epoch
    last = num_last_epochs * steps_per_epoch
    target = base_lr * min_lr_ratio

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * warmup_ratio * ((step + 1.0) / warmup_iters) ** 2
        denom = max(total - warmup_iters - last, 1)
        prog = jnp.clip((step + 1.0 - warmup_iters) / denom, 0.0, 1.0)
        cos = target + 0.5 * (base_lr - target) * (
            1.0 + jnp.cos(jnp.pi * prog))
        out = jnp.where(step < warmup_iters, warm, cos)
        return jnp.where(step + 1.0 >= total - last, target, out)

    return sched


def frozen_stages_mask(params, frozen_stages: int):
    """True for params in frozen backbone stages (replaces the reference's
    ``requires_grad=False`` freezing, ``resnet.py`` ``_freeze_stages``).
    Matching is on the param name directly under ``backbone`` so block-
    internal names like ``conv1`` never shadow the stem prefixes."""
    prefixes = []
    for s in range(frozen_stages + 1):
        prefixes.extend(resnet_param_prefixes_for_stage(s))

    def mask_fn(path, _):
        names = [str(getattr(p, "key", p)) for p in path]
        if "backbone" not in names:
            return False
        i = names.index("backbone") + 1
        if names[i] == "resnet":  # HiddenMixupResNet wrapper level
            i += 1
        child = names[i]
        return any(child.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(
    lr_schedule: Callable,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip_norm: Optional[float] = 35.0,
    params=None,
    frozen_stages: int = -1,
    opt_type: str = "sgd",
    nesterov: bool = False,
):
    """SGD+momentum (or AdamW for transformer backbones) + L2 + global-norm
    clip (reference optimizer_config: grad_clip max_norm 35)."""
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if opt_type == "adamw":
        chain.append(optax.adamw(learning_rate=lr_schedule, weight_decay=weight_decay))
    else:
        chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.sgd(learning_rate=lr_schedule, momentum=momentum,
                               nesterov=nesterov))
    if frozen_stages >= 0 and params is not None:
        # zero the final update for frozen params (optax.masked passes
        # unmasked updates through *unchanged*, so the zeroing must be its
        # own trailing stage, not a wrapper around the whole chain)
        # callable mask: evaluated on the tree the transform actually sees
        # (under multi_transform the aux-labeled subtrees arrive as
        # MaskedNode leaves, which a pre-computed tree would not match)
        chain.append(optax.masked(
            optax.set_to_zero(),
            lambda ps: frozen_stages_mask(ps, frozen_stages)))
    tx = optax.chain(*chain)
    aux = [k for k in ("domain_head", "jig_head")
           if params is not None and k in params]
    if aux:
        # DG auxiliary classifiers train with their own Adam(1e-3) +
        # grad-clip 0.1 (reference detectors/faster_rcnn.py:84-85,165-168;
        # single clean update instead of the reference's lagged Adam +
        # main-SGD double step — ARCHITECTURE.md deviation 23)
        aux_tx = optax.chain(
            optax.clip_by_global_norm(0.1), optax.adam(1e-3))

        def label_fn(ps):
            return {k: ("aux" if k in aux else "main") for k in ps}

        return optax.multi_transform({"main": tx, "aux": aux_tx}, label_fn)
    return tx


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
    )


class _MutableNet:
    """Shim that routes every ``net.apply`` inside a detector's ``loss``
    through ``mutable=['batch_stats']`` and accumulates the updated running
    statistics — this is how live (Sync)BatchNorm training threads its
    state through the otherwise-pure step (reference SyncBN surface,
    SURVEY.md §2.3).  Detectors whose nets hold only FrozenBatchNorm pass
    through unchanged."""

    def __init__(self, net, batch_stats):
        self._net = net
        self.stats = batch_stats

    def apply(self, variables, *args, **kwargs):
        if variables is None or "mutable" in kwargs:
            return self._net.apply(variables, *args, **kwargs)
        merged = dict(variables)
        if self.stats:
            merged["batch_stats"] = self.stats
        out, upd = self._net.apply(
            merged, *args, mutable=["batch_stats"], **kwargs
        )
        new = upd.get("batch_stats")
        if new:
            self.stats = new
        return out

    def __getattr__(self, name):
        return getattr(self._net, name)


def loss_with_live_bn(detector, variables, rng, batch, *args, **kwargs):
    """Run ``detector.loss`` with live-BN statistics updates captured.

    Returns ``(losses, new_batch_stats)``.  The net swap happens at trace
    time (detectors are plain python orchestrators), so the jitted step
    stays pure — the updated stats flow out as part of the return pytree."""
    orig = detector.net
    proxy = _MutableNet(orig, variables.get("batch_stats", {}))
    detector.net = proxy
    try:
        losses = detector.loss(variables, rng, batch, *args, **kwargs)
    finally:
        detector.net = orig
    return losses, proxy.stats


def make_train_step(
    detector,
    anchors,
    num_level_anchors,
    loss_weights: Optional[Dict[str, float]] = None,
    proposal_mode: str = "fused",
):
    """Build the pure train step.  Global-batch semantics: under pjit with a
    sharded batch axis, every sum/mean inside the loss is a global reduction
    — this reproduces DDP + ``reduce_mean`` numerics (SURVEY.md §2.4) with
    compiler-scheduled collectives.  Live-BN layers (LiveBatchNorm) update
    their running stats through the step; their batch-stat reductions are
    global under the sharded batch axis, i.e. SyncBN.

    ``proposal_mode`` (two-stage detectors with a ``train_sample`` method
    only; docs/TRAIN_PERF.md round-3 split experiment):

    - ``"fused"``: proposals computed inside the differentiated program
      (reference semantics, single dispatch — the default).
    - ``"outside_grad"``: one dispatch, but a second non-grad forward
      computes proposals + RoI sampling *before* ``value_and_grad``, so the
      sequential NMS chain never sits inside the grad program.  Numerically
      identical to ``fused`` (same rng split); costs one extra backbone+RPN
      forward.
    - ``"external"``: the step takes a precomputed ``RoISample`` as a 4th
      argument (produced by :func:`make_sample_step` in a separate
      dispatch).  Numerically identical to ``fused``.
    - ``"stale"``: the step takes the *previous* step's ``RoISample`` and
      returns the next one, computed after the grad region from this
      step's (detached) RPN outputs — no duplicate forward, NMS outside
      grad, but proposals lag the params by one step (documented deviation;
      opt-in only).
    """
    if proposal_mode not in ("fused", "outside_grad", "external", "stale"):
        raise ValueError(f"unknown proposal_mode {proposal_mode!r}")

    def _grad_part(state: TrainState, batch, rng, sample):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            kwargs = {} if proposal_mode == "fused" else {"sample": sample}
            losses, new_stats = loss_with_live_bn(
                detector, variables, rng, batch, anchors, num_level_anchors,
                **kwargs,
            )
            rpn_outs = (
                getattr(detector, "_last_rpn_outs", None)
                if proposal_mode == "stale" else None
            )
            total = jnp.asarray(0.0)
            for k, v in losses.items():
                w = (loss_weights or {}).get(k, 1.0)
                total = total + w * jnp.sum(v)
            return total, (losses, new_stats, rpn_outs)

        (total, (losses, new_stats, rpn_outs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(
            batch_stats=jax.lax.stop_gradient(new_stats)
        )
        metrics = {"loss": total, **{k: jnp.sum(v) for k, v in losses.items()}}
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics, rpn_outs

    if proposal_mode in ("fused", "outside_grad"):

        def train_step(state: TrainState, batch, rng):
            rng = jax.random.fold_in(rng, state.step)
            sample = None
            if proposal_mode == "outside_grad":
                variables = {
                    "params": state.params,
                    "batch_stats": state.batch_stats,
                }
                sample = detector.train_sample(
                    variables, rng, batch, anchors, num_level_anchors)
            new_state, metrics, _ = _grad_part(state, batch, rng, sample)
            return new_state, metrics

    elif proposal_mode == "external":

        def train_step(state: TrainState, batch, rng, sample):
            rng = jax.random.fold_in(rng, state.step)
            new_state, metrics, _ = _grad_part(state, batch, rng, sample)
            return new_state, metrics

    else:  # stale

        def train_step(state: TrainState, batch, rng, sample):
            rng = jax.random.fold_in(rng, state.step)
            new_state, metrics, rpn_outs = _grad_part(
                state, batch, rng, sample)
            next_rng = jax.random.fold_in(rng, 1)
            next_sample = detector.sample_from_rpn_outs(
                next_rng, rpn_outs, batch, anchors, num_level_anchors)
            return new_state, metrics, next_sample

    return train_step


def make_multi_step_train(
    detector,
    anchors,
    num_level_anchors,
    loss_weights: Optional[Dict[str, float]] = None,
):
    """Scan the fused train step over a leading steps axis of stacked
    batches: ONE dispatch executes S optimizer steps.

    This is the standard TPU training-loop amortization: per-dispatch host
    overhead (~7 ms/step through the axon relay — docs/TRAIN_PERF.md
    round-3 measurements) divides by S, while `lax.scan` compiles the step
    body once.  Numerically identical to S sequential `make_train_step`
    calls with the same outer rng: the per-step `fold_in(rng, state.step)`
    inside the fused step differentiates the scanned iterations because
    ``state.step`` advances through the carry.

    Signature: ``multi_step(state, batches, rng) -> (state, metrics)`` where
    every leaf of ``batches`` has a leading ``(S, ...)`` steps axis and the
    returned metrics are stacked ``(S,)`` per-step values.
    """
    step = make_train_step(
        detector, anchors, num_level_anchors, loss_weights, "fused"
    )

    def multi_step(state: TrainState, batches, rng):
        def body(s, batch):
            return step(s, batch, rng)

        return jax.lax.scan(body, state, batches)

    return multi_step


def make_sample_step(detector, anchors, num_level_anchors):
    """Non-grad dispatch producing the ``RoISample`` consumed by a
    ``proposal_mode="external"`` train step (same per-step rng fold)."""

    def sample_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return detector.train_sample(
            variables, rng, batch, anchors, num_level_anchors)

    return sample_step
