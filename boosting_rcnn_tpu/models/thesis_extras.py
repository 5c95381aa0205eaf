"""Thesis/DG extras — the self-contained model-code subset (VERDICT r2
item 10).

The reference fork carries domain-generalization experiment code inside
``mmdet/models/detectors/faster_rcnn.py:46-1085`` and
``backbones/hiddenMixupResnet.py``.  The pure model components are rebuilt
here:

- :class:`EMAU` / :class:`FPEMAU` — Expectation-Maximization Attention
  Units (``faster_rcnn.py:849`` / ``:924``): iterative EM over a learned
  basis ``mu`` (no gradients through the E/M steps), reconstruction,
  residual 1x1 convs.  The reference updates ``mu`` by moving average in
  the train script; here the batch ``mu`` is returned for the caller to
  EMA.
- :class:`HiddenMixupResNet` — two-view backbone (``hiddenMixupResnet.py:
  670``): both views share every stage; training can mix hidden states
  (``mixup_data``: Beta(alpha, alpha) convex blend) and/or emit the
  spatial/channel contrastive losses (``:720-739``).

The DG *detector wrappers* (DGFasterRCNN / JiGEN / DGaug / MMDAAE,
``faster_rcnn.py:47-729``) remain descoped — they are thesis experiment
harnesses around torch DataLoader double-batches, not framework
components; recorded in ARCHITECTURE.md deviations.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .backbones.resnet import ResNet


def _l2norm(x, axis):
    return x / (1e-6 + jnp.linalg.norm(x, axis=axis, keepdims=True))


def _mu_buffer(module: nn.Module, c: int, k: int):
    """The EM basis ``mu`` is a torch *buffer* in the reference (registered
    at ``faster_rcnn.py:860``, updated under no_grad with momentum 0.9 in
    ``EMAFasterRCNN.forward_train:818-822``), not a trainable parameter —
    stored here in ``batch_stats`` and self-updated when the collection is
    mutable (the train step applies with ``mutable=['batch_stats']``)."""
    return module.variable(
        "batch_stats", "mu",
        lambda: _l2norm(
            jax.random.normal(jax.random.PRNGKey(0), (c, k))
            * math.sqrt(2.0 / k),
            axis=0,
        ),
    )


class EMAU(nn.Module):
    """EM Attention Unit on one NHWC map -> (out, batch mu)."""

    k: int = 64
    stage_num: int = 3
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        idn = x
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv1")(x)

        mu_var = _mu_buffer(self, c, self.k)
        xf = x.reshape(b, h * w, c).astype(jnp.float32)
        mu = jnp.broadcast_to(mu_var.value[None], (b, c, self.k))

        def em_step(mu, _):
            z = jax.nn.softmax(jnp.einsum("bnc,bck->bnk", xf, mu), axis=2)
            z_ = z / (1e-6 + z.sum(axis=1, keepdims=True))
            mu = _l2norm(jnp.einsum("bnc,bnk->bck", xf, z_), axis=1)
            return mu, None

        # reference wraps the EM loop in torch.no_grad()
        mu, _ = jax.lax.stop_gradient(
            jax.lax.scan(em_step, mu, None, length=self.stage_num))
        if self.is_mutable_collection("batch_stats"):
            mu_var.value = (
                self.momentum * mu_var.value
                + (1.0 - self.momentum) * jnp.mean(mu, axis=0)
            )
        z = jax.nn.softmax(jnp.einsum("bnc,bck->bnk", xf, mu), axis=2)
        rec = jnp.einsum("bck,bnk->bnc", mu, z).reshape(b, h, w, c)
        rec = nn.relu(rec.astype(self.dtype))
        rec = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv2")(rec)
        rec = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                           name="bn2")(rec)
        return nn.relu(rec + idn), mu


class FPEMAU(nn.Module):
    """Feature-pyramid EMAU (``faster_rcnn.py:924``): one shared basis and
    shared 1x1 convs applied across every FPN level."""

    k: int = 64
    stage_num: int = 3
    momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Tuple[jnp.ndarray, ...]):
        c = feats[0].shape[-1]
        conv1 = nn.Conv(c, (1, 1), dtype=self.dtype, name="conv1")
        conv2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv2")
        bn2 = nn.BatchNorm(use_running_average=True, dtype=self.dtype,
                           name="bn2")
        mu_var = _mu_buffer(self, c, self.k)
        b = feats[0].shape[0]
        idn = feats
        xs = [conv1(f) for f in feats]
        # E/M over the concatenated pyramid (all levels share the basis)
        flat = jnp.concatenate(
            [f.reshape(b, -1, c).astype(jnp.float32) for f in xs], axis=1)
        mu = jnp.broadcast_to(mu_var.value[None], (b, c, self.k))

        def em_step(mu, _):
            z = jax.nn.softmax(jnp.einsum("bnc,bck->bnk", flat, mu), axis=2)
            z_ = z / (1e-6 + z.sum(axis=1, keepdims=True))
            return _l2norm(jnp.einsum("bnc,bnk->bck", flat, z_), axis=1), None

        mu, _ = jax.lax.stop_gradient(
            jax.lax.scan(em_step, mu, None, length=self.stage_num))
        if self.is_mutable_collection("batch_stats"):
            # EMAFasterRCNN.forward_train: mu buffer <- 0.9*mu + 0.1*mean_b
            mu_var.value = (
                self.momentum * mu_var.value
                + (1.0 - self.momentum) * jnp.mean(mu, axis=0)
            )
        outs = []
        for f, i in zip(xs, idn):
            bb, h, w, _ = f.shape
            ff = f.reshape(b, h * w, c).astype(jnp.float32)
            z = jax.nn.softmax(jnp.einsum("bnc,bck->bnk", ff, mu), axis=2)
            rec = jnp.einsum("bck,bnk->bnc", mu, z).reshape(b, h, w, c)
            rec = bn2(conv2(nn.relu(rec.astype(self.dtype))))
            outs.append(nn.relu(rec + i))
        return tuple(outs), mu


def mixup_data(rng, x1, x2, alpha: float = 2.0):
    """Convex blend with lam ~ Beta(alpha, alpha)
    (``hiddenMixupResnet.py:739``)."""
    lam = jax.random.beta(rng, alpha, alpha)
    return lam * x1 + (1.0 - lam) * x2


def global_k_max_pool_loss(var, k):
    """Mean of the top-k values (``GlobalkMaxPooling``)."""
    b = var.shape[0]
    flat = var.reshape(b, -1)
    top, _ = jax.lax.top_k(flat, k)
    return top.mean()


def spatial_contrastive_loss(x1, x2, margin: float = 0.01):
    """``hiddenMixupResnet.py:720``: hinge on per-pixel channel-mean squared
    difference, top-(hw/16) pooled."""
    var = jnp.mean((x1 - x2) ** 2, axis=-1)  # (B, H, W)
    var = jax.nn.relu(var - margin)
    h, w = var.shape[1:3]
    k = max((h // 4) * (w // 4), 1)
    return global_k_max_pool_loss(var, k)


def channel_contrastive_loss(x1, x2):
    """``hiddenMixupResnet.py:731``: per-channel spatial-mean squared
    difference, top-(c/8) pooled."""
    var = jnp.mean((x1 - x2) ** 2, axis=(1, 2))  # (B, C)
    k = max(var.shape[-1] // 8, 1)
    return global_k_max_pool_loss(var, k)


class HiddenMixupResNet(nn.Module):
    """Two-view ResNet (``hiddenMixupResnet.py:670``).

    Single-view call == plain ResNet.  With a second view, both run the
    shared stages; ``mix_rng`` enables hidden-state mixup after each
    stage, and the spatial contrastive loss over the first output level is
    returned as the auxiliary term the DG recipes consume.
    """

    resnet: ResNet

    def _stages(self, x):
        return self.resnet(x)

    @nn.compact
    def __call__(self, x1, x2=None, mix_rng=None, mixup_alpha: float = 2.0,
                 train: bool = False):
        outs1 = self._stages(x1)
        if x2 is None:
            return (outs1, jnp.zeros(())) if train else outs1
        outs2 = self._stages(x2)
        contrastive = spatial_contrastive_loss(
            outs1[0].astype(jnp.float32), outs2[0].astype(jnp.float32))
        if mix_rng is not None:
            rngs = jax.random.split(mix_rng, len(outs1))
            outs1 = tuple(
                mixup_data(r, a, b, mixup_alpha) if i > 0 else a
                for i, (r, a, b) in enumerate(zip(rngs, outs1, outs2))
            )
        if train:
            return outs1, contrastive
        return outs1
