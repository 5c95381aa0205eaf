"""PISA: prime sample attention (reference
``mmdet/models/losses/pisa_loss.py``: ``isr_p`` + ``carl_loss``).

Fixed-shape forms: the reference's per-(label, gt) sort loops become
masked O(N^2) rank computations (N = sampled RoIs, 512 -> trivial on the
VPU); invalid/padded slots carry zero weight throughout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["isr_p_weights", "carl_loss"]


def _group_rank(values: jnp.ndarray, same_group: jnp.ndarray) -> jnp.ndarray:
    """Descending rank of each element within its group (0 = largest).

    ``same_group[i, j]`` True when i and j belong to the same group.
    Ties broken by index (matches a stable sort).
    """
    n = values.shape[0]
    vi = values[:, None]
    vj = values[None, :]
    idx = jnp.arange(n)
    earlier = (vj > vi) | ((vj == vi) & (idx[None, :] < idx[:, None]))
    return jnp.sum((earlier & same_group).astype(jnp.int32), axis=1)


def isr_p_weights(
    labels: jnp.ndarray,  # (N,) class ids (padded slots arbitrary)
    gt_ids: jnp.ndarray,  # (N,) matched gt index (globally unique per gt)
    ious: jnp.ndarray,  # (N,) IoU(decoded pred, decoded target)
    label_weights: jnp.ndarray,  # (N,)
    pos_mask: jnp.ndarray,  # (N,) bool
    pos_loss_cls: jnp.ndarray,  # (N,) elementwise CE of pos slots
    k: float = 2.0,
    bias: float = 0.0,
):
    """Importance-based sample reweighting, positive part (``isr_p:9``).

    Returns new label weights: positives reweighted by IoU-HLR (hierarchical
    local rank), renormalised so the positive cls loss value is unchanged.
    """
    posf = pos_mask.astype(jnp.float32)
    n_pos = jnp.maximum(posf.sum(), 1.0)
    # per-class positive count -> max_l_num
    same_label = (labels[:, None] == labels[None, :]) & pos_mask[None, :] \
        & pos_mask[:, None]
    per_label_count = jnp.sum(same_label.astype(jnp.int32), axis=1)
    max_l_num = jnp.maximum(jnp.max(per_label_count), 1)

    # rank within (label, gt): sorted by IoU descending
    same_gt = same_label & (gt_ids[:, None] == gt_ids[None, :])
    t_rank = _group_rank(ious, same_gt)
    ious_hlr = ious + (max_l_num.astype(ious.dtype) - t_rank)
    # rank within label of the shifted IoU -> IoU-HLR
    l_rank = _group_rank(ious_hlr, same_label)
    imp = (max_l_num.astype(ious.dtype) - l_rank) / max_l_num
    pos_imp = label_weights * imp
    pos_imp = (bias + pos_imp * (1 - bias)) ** k
    # renormalise: keep the positive cls loss sum unchanged
    ori = jnp.sum(pos_loss_cls * label_weights * posf)
    new = jnp.maximum(jnp.sum(pos_loss_cls * pos_imp * posf), 1e-12)
    pos_imp = pos_imp * ori / new
    return jnp.where(pos_mask, pos_imp, label_weights)


def carl_loss(
    cls_score: jnp.ndarray,  # (N, C+1) or (N, C) logits
    labels: jnp.ndarray,  # (N,)
    pos_mask: jnp.ndarray,  # (N,)
    loss_reg_elem: jnp.ndarray,  # (N, 4) elementwise reg loss
    k: float = 1.0,
    bias: float = 0.2,
    avg_factor: float = None,
    sigmoid: bool = False,
):
    """Classification-aware regression loss (``carl_loss:123``)."""
    c = cls_score.shape[-1]
    safe = jnp.clip(labels, 0, c - 1)
    if sigmoid:
        p = jax.nn.sigmoid(cls_score.astype(jnp.float32))
    else:
        p = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    pos_p = jnp.take_along_axis(p, safe[:, None], axis=-1)[:, 0]
    w = (bias + (1 - bias) * pos_p) ** k
    posf = pos_mask.astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(posf), 1.0)
    w = w * n_pos / jnp.maximum(jnp.sum(w * posf), 1e-12)
    if avg_factor is None:
        avg_factor = loss_reg_elem.shape[0]
    return jnp.sum(
        loss_reg_elem * (w * posf)[:, None]) / avg_factor
