"""Loss functions matching mmdet 2.17 numerics, as pure JAX.

The reference wraps every loss in the ``weight_reduce_loss`` protocol
(``mmdet/models/losses/utils.py:29-58``): elementwise loss * optional weight,
then reduce by ``mean``/``sum``/``none`` or divide by an explicit
``avg_factor``.  We reproduce that protocol exactly — it is what makes the
boosting-reweighting renormalisation (``prob_roi_head.py:151-154``) and the
IoU-weighted RPN box loss (``atss_rpn_head.py:340-379``) come out right.

Native-op note: the CUDA ``sigmoid_focal_loss`` the reference uses
(``mmdet/models/losses/focal_loss.py:5``) is numerically the python spec at
``focal_loss.py:12``; XLA fuses the whole expression into the surrounding
computation, so no custom kernel is needed on TPU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .box_ops import bbox_overlaps_aligned, bbox_center_wh

__all__ = [
    "weight_reduce_loss",
    "sigmoid_focal_loss",
    "varifocal_loss",
    "quality_focal_loss",
    "distribution_focal_loss",
    "cross_entropy_loss",
    "binary_cross_entropy_loss",
    "l1_loss",
    "smooth_l1_loss",
    "mse_loss",
    "balanced_l1_loss",
    "iou_loss",
    "giou_loss",
    "diou_loss",
    "ciou_loss",
    "eiou_loss",
    "focal_eiou_loss",
    "accuracy",
]


def weight_reduce_loss(loss, weight=None, reduction="mean", avg_factor=None):
    """The mmdet reduction protocol (``losses/utils.py:29``)."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == "mean":
            return jnp.mean(loss)
        if reduction == "sum":
            return jnp.sum(loss)
        return loss
    if reduction == "mean":
        return jnp.sum(loss) / avg_factor
    if reduction == "none":
        return loss
    raise ValueError('avg_factor can not be used with reduction="sum"')


def _bce_with_logits(pred, target):
    """Elementwise binary cross entropy on logits (stable form)."""
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def sigmoid_focal_loss(
    pred,
    target,
    weight=None,
    gamma: float = 2.0,
    alpha: float = 0.25,
    reduction: str = "mean",
    avg_factor=None,
):
    """Focal loss on ``(N, C)`` logits vs ``(N, C)`` 0/1 targets.

    Matches ``py_sigmoid_focal_loss`` (``focal_loss.py:12``).  ``weight`` of
    shape ``(N,)`` broadcasts over classes as in the reference.
    """
    p = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    pt = (1 - p) * target + p * (1 - target)
    focal_weight = (alpha * target + (1 - alpha) * (1 - target)) * pt**gamma
    loss = _bce_with_logits(pred, target) * focal_weight
    if weight is not None and weight.ndim == 1 and loss.ndim == 2:
        weight = weight[:, None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def one_hot_targets(labels, num_classes):
    """FG one-hot for labels in [0, C); label == C (bg) -> all-zero row."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def varifocal_loss(
    pred,
    target,
    weight=None,
    alpha: float = 0.75,
    gamma: float = 2.0,
    iou_weighted: bool = True,
    reduction: str = "mean",
    avg_factor=None,
):
    """Varifocal loss (``mmdet/models/losses/varifocal_loss.py``): targets are
    soft IoU scores on the gt class, 0 elsewhere."""
    p = jax.nn.sigmoid(pred)
    target = target.astype(pred.dtype)
    if iou_weighted:
        focal_weight = target * (target > 0.0) + alpha * jnp.abs(p - target) ** gamma * (
            target <= 0.0
        )
    else:
        focal_weight = (target > 0.0).astype(pred.dtype) + alpha * jnp.abs(
            p - target
        ) ** gamma * (target <= 0.0)
    loss = _bce_with_logits(pred, target) * focal_weight
    if weight is not None and weight.ndim == 1 and loss.ndim == 2:
        weight = weight[:, None]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def quality_focal_loss(
    pred,
    labels,
    quality,
    weight=None,
    beta: float = 2.0,
    reduction: str = "mean",
    avg_factor=None,
):
    """Quality focal loss (GFL) on ``(N, C)`` logits.

    ``labels``: int ``(N,)`` in [0, C] (C = bg); ``quality``: ``(N,)`` IoU
    scores for positives.  Mirrors ``gfocal_loss.py`` semantics.
    """
    n, c = pred.shape
    p = jax.nn.sigmoid(pred)
    # Negatives: target 0 everywhere.
    loss = _bce_with_logits(pred, jnp.zeros_like(pred)) * p**beta
    # Positives: on the gt class, target = quality.
    pos = labels < c
    safe_labels = jnp.where(pos, labels, 0)
    onehot = jax.nn.one_hot(safe_labels, c, dtype=bool) & pos[:, None]
    q = jnp.broadcast_to(quality[:, None], (n, c))
    pos_loss = _bce_with_logits(pred, q) * jnp.abs(q - p) ** beta
    loss = jnp.where(onehot, pos_loss, loss)
    loss = jnp.sum(loss, axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def distribution_focal_loss(pred, label, weight=None, reduction="mean", avg_factor=None):
    """DFL (GFL): ``pred`` ``(N, n_bins)`` logits over discrete offsets,
    ``label`` continuous in [0, n_bins - 1]."""
    dis_left = jnp.floor(label).astype(jnp.int32)
    dis_right = dis_left + 1
    w_left = dis_right.astype(pred.dtype) - label
    w_right = label - dis_left.astype(pred.dtype)
    logp = jax.nn.log_softmax(pred, axis=-1)
    ll = jnp.take_along_axis(logp, dis_left[:, None], axis=-1)[:, 0]
    lr = jnp.take_along_axis(
        logp, jnp.clip(dis_right, 0, pred.shape[-1] - 1)[:, None], axis=-1
    )[:, 0]
    loss = -(ll * w_left + lr * w_right)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def cross_entropy_loss(
    pred,
    label,
    weight=None,
    reduction: str = "mean",
    avg_factor=None,
    class_weight=None,
):
    """Softmax CE on ``(N, C)`` logits vs int labels (mmdet
    ``cross_entropy_loss.py:168`` ``use_sigmoid=False`` path)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    ll = jnp.take_along_axis(logp, label[:, None], axis=-1)[:, 0]
    loss = -ll
    if class_weight is not None:
        loss = loss * jnp.asarray(class_weight)[label]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def binary_cross_entropy_loss(
    pred, target, weight=None, reduction: str = "mean", avg_factor=None
):
    """BCE-with-logits (mmdet CrossEntropyLoss ``use_sigmoid=True``), e.g. the
    RPN IoU-branch 'centerness' loss (``atss_rpn_head.py:383-386``)."""
    loss = _bce_with_logits(pred, target.astype(pred.dtype))
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = jnp.abs(pred - target)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def smooth_l1_loss(pred, target, weight=None, beta=1.0, reduction="mean", avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def mse_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = (pred - target) ** 2
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def balanced_l1_loss(
    pred,
    target,
    weight=None,
    beta=1.0,
    alpha=0.5,
    gamma=1.5,
    reduction="mean",
    avg_factor=None,
):
    diff = jnp.abs(pred - target)
    b = jnp.e ** (gamma / alpha) - 1
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1) * jnp.log(b * diff / beta + 1) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta,
    )
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _iou_family(pred, target, mode, eps):
    if mode == "iou":
        ious = bbox_overlaps_aligned(pred, target, eps=eps)
        return -jnp.log(jnp.maximum(ious, eps))
    if mode == "linear_iou":
        ious = bbox_overlaps_aligned(pred, target, eps=eps)
        return 1.0 - ious
    if mode == "giou":
        gious = bbox_overlaps_aligned(pred, target, mode="giou", eps=eps)
        return 1.0 - gious
    raise ValueError(mode)


def iou_loss(
    pred,
    target,
    weight=None,
    linear=False,
    eps=1e-6,
    reduction="mean",
    avg_factor=None,
):
    """IoULoss (``iou_loss.py:457``): ``-log(iou)`` by default (the shipping
    Boosting config), or ``1 - iou`` when ``linear``."""
    loss = _iou_family(pred, target, "linear_iou" if linear else "iou", eps)
    if weight is not None and weight.ndim == loss.ndim + 1:
        # the reference sometimes passes (N, 4) weights for box losses;
        # mmdet takes weight.mean(-1) in that case
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def giou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    loss = _iou_family(pred, target, "giou", eps)
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _diou_term(pred, target, eps):
    ious = bbox_overlaps_aligned(pred, target, eps=eps)
    px, py, pw, ph = bbox_center_wh(pred)
    tx, ty, tw, th = bbox_center_wh(target)
    center_dist = (px - tx) ** 2 + (py - ty) ** 2
    enc_lt = jnp.minimum(pred[..., :2], target[..., :2])
    enc_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    enc_wh = jnp.maximum(enc_rb - enc_lt, 0.0)
    diag = enc_wh[..., 0] ** 2 + enc_wh[..., 1] ** 2 + eps
    return ious, center_dist / diag, (pw, ph, tw, th)


def diou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    ious, dist_term, _ = _diou_term(pred, target, eps)
    loss = 1.0 - ious + dist_term
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def ciou_loss(pred, target, weight=None, eps=1e-7, reduction="mean", avg_factor=None):
    """CIoU (``iou_loss.py:654``), used by the COCO boosting config."""
    ious, dist_term, (pw, ph, tw, th) = _diou_term(pred, target, eps)
    factor = 4.0 / (jnp.pi**2)
    v = factor * (jnp.arctan(tw / (th + eps)) - jnp.arctan(pw / (ph + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (1.0 - ious + v + eps))
    loss = 1.0 - ious + dist_term + alpha * v
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def _eiou_terms(pred, target, eps):
    """Shared EIoU geometry (reference fork ``iou_loss.py:300-344``)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    overlap = wh[..., 0] * wh[..., 1]
    ap = (pred[..., 2] - pred[..., 0]) * (pred[..., 3] - pred[..., 1])
    ag = (target[..., 2] - target[..., 0]) * (target[..., 3] - target[..., 1])
    union = ap + ag - overlap + eps
    ious = jax.lax.stop_gradient(overlap / union)
    e_lt = jnp.minimum(pred[..., :2], target[..., :2])
    e_rb = jnp.maximum(pred[..., 2:], target[..., 2:])
    e_wh = jnp.clip(e_rb - e_lt, 0.0, None)
    cw = e_wh[..., 0] + eps
    ch = e_wh[..., 1] + eps
    c2 = cw**2 + ch**2 + eps
    rho2 = (
        ((target[..., 0] + target[..., 2]) - (pred[..., 0] + pred[..., 2]))
        ** 2
        + ((target[..., 1] + target[..., 3]) - (pred[..., 1] + pred[..., 3]))
        ** 2
    ) / 4.0
    w1 = pred[..., 2] - pred[..., 0]
    h1 = pred[..., 3] - pred[..., 1]
    w2 = target[..., 2] - target[..., 0]
    h2 = target[..., 3] - target[..., 1]
    rhow = (jnp.abs(w2 - w1) + eps) ** 2
    rhoh = (jnp.abs(h2 - h1) + eps) ** 2
    return ious, 1.0 - ious + rho2 / c2 + rhow / cw**2 + rhoh / ch**2


def eiou_loss(pred, target, weight=None, eps=1e-7, reduction="mean",
              avg_factor=None):
    """EIoU (fork-added, reference ``iou_loss.py:300,346``): IoU + center
    distance + per-axis width/height distance penalties."""
    _, loss = _eiou_terms(pred, target, eps)
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def focal_eiou_loss(pred, target, weight=None, gamma=0.5, eps=1e-7,
                    reduction="mean", avg_factor=None):
    """Focal-EIoU (fork-added, reference ``iou_loss.py:240,396``):
    EIoU reweighted by IoU**gamma (high-IoU pairs dominate)."""
    ious, base = _eiou_terms(pred, target, eps)
    loss = base * ious**gamma
    if weight is not None and weight.ndim == loss.ndim + 1:
        weight = weight.mean(axis=-1)
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def accuracy(pred, label, mask=None):
    """Top-1 accuracy over valid rows."""
    correct = (jnp.argmax(pred, axis=-1) == label).astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0) * 100.0
    return jnp.mean(correct) * 100.0


def _ghm_weights(g, valid, bins: int, momentum: float, acc_sum):
    """Gradient-density weights shared by GHM-C/R (reference
    ``mmdet/models/losses/ghm_loss.py:94-112,198-214``).

    Elements are binned by gradient length ``g`` into ``bins`` uniform unit
    regions (``floor(g*bins)`` clamped to the last bin — equivalent to the
    reference's ``g >= i/bins & g < (i+1)/bins`` edges incl. the widened
    last edge, implemented as one scatter-add instead of a ``bins``-mask
    loop so the bin histogram is a single pass on TPU).  With
    ``momentum>0`` the per-bin denominator is the EMA ``acc_sum`` buffer,
    updated in place for non-empty bins exactly like the reference's
    ``acc_sum[i] = mmt*acc_sum[i] + (1-mmt)*num_in_bin`` (empty bins keep
    their running value), and the *post-update* value weights this step —
    matching the reference order of operations.

    Returns ``(weights, tot, new_acc_sum)``; ``g`` carries no gradient
    (built from comparisons / clamped floor only).
    """
    gf = jax.lax.stop_gradient(g.astype(jnp.float32))
    v = valid.astype(jnp.float32)
    bi = jnp.clip(jnp.floor(gf * bins).astype(jnp.int32), 0, bins - 1)
    num_in_bin = jnp.zeros((bins,), jnp.float32).at[
        bi.reshape(-1)
    ].add(v.reshape(-1))
    has = num_in_bin > 0
    tot = jnp.maximum(v.sum(), 1.0)
    if momentum > 0.0:
        new_acc = jnp.where(
            has, momentum * acc_sum + (1.0 - momentum) * num_in_bin, acc_sum
        )
        denom = new_acc
    else:
        new_acc = acc_sum
        denom = num_in_bin
    n = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
    wbin = jnp.where(has, tot / jnp.maximum(denom, 1e-12), 0.0) / n
    weights = wbin[bi] * v
    return weights, tot, new_acc


def ghm_c_loss(
    pred,
    target,
    label_weight,
    bins: int = 10,
    momentum: float = 0.0,
    reduction: str = "mean",
    acc_sum=None,
):
    """GHM classification loss (reference ``mmdet/models/losses/ghm_loss.py``
    ``GHMC``): per-sample BCE reweighted by the inverse gradient-density of
    its bin.  ``momentum>0`` is the reference's EMA-of-bin-counts variant:
    pass the running ``acc_sum`` buffer (shape ``(bins,)``, held in
    ``batch_stats`` by the owning head) and the call returns
    ``(loss, new_acc_sum)``; with ``acc_sum=None`` the stateless per-batch
    density is used and only the loss is returned.
    """
    if momentum > 0.0 and acc_sum is None:
        raise ValueError(
            "ghm_c_loss: momentum>0 (EMA bin counts) needs the acc_sum "
            "state buffer (see RetinaConvs ghm state in batch_stats)."
        )
    target = target.astype(pred.dtype)
    g = jnp.abs(jax.nn.sigmoid(pred) - target)
    valid = label_weight > 0
    weights, tot, new_acc = _ghm_weights(g, valid, bins, momentum, acc_sum)
    loss = _bce_with_logits(pred, target) * weights
    loss = weight_reduce_loss(loss, None, reduction, tot)
    return (loss, new_acc) if acc_sum is not None else loss


def ghm_r_loss(
    pred,
    target,
    label_weight,
    mu: float = 0.02,
    bins: int = 10,
    momentum: float = 0.0,
    reduction: str = "mean",
    acc_sum=None,
):
    """GHM regression loss (ASL1 base, density-reweighted; reference
    ``GHMR``).  ``momentum``/``acc_sum`` semantics as :func:`ghm_c_loss`."""
    if momentum > 0.0 and acc_sum is None:
        raise ValueError(
            "ghm_r_loss: momentum>0 (EMA bin counts) needs the acc_sum "
            "state buffer (see RetinaConvs ghm state in batch_stats)."
        )
    diff = pred - target
    asl1 = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff))
    valid = label_weight > 0
    weights, tot, new_acc = _ghm_weights(g, valid, bins, momentum, acc_sum)
    loss = weight_reduce_loss(asl1 * weights, None, reduction, tot)
    return (loss, new_acc) if acc_sum is not None else loss


def seesaw_loss(
    pred,
    labels,
    cum_counts,
    weight=None,
    p: float = 0.8,
    q: float = 2.0,
    eps: float = 1e-2,
    reduction: str = "mean",
    avg_factor=None,
):
    """Seesaw loss (reference ``seesaw_loss.py``): per-class-pair mitigation
    (count ratio^p) and compensation (prob ratio^q) factors scale the
    negative logits' softmax weights.  ``cum_counts``: (C,) class counts.
    """
    n, c = pred.shape
    onehot = jax.nn.one_hot(labels, c)
    counts = jnp.maximum(cum_counts.astype(pred.dtype), 1.0)
    ratio = counts[None, :] / counts[:, None]  # (C, C): N_j / N_i
    mitigation = jnp.where(ratio < 1.0, ratio**p, 1.0)  # (C_i=gt, C_j)
    m = mitigation[labels]  # (N, C)
    probs = jax.nn.softmax(pred, axis=-1)
    p_at = jnp.take_along_axis(probs, labels[:, None], axis=-1)
    comp = jnp.where(probs > p_at, (probs / jnp.maximum(p_at, eps)) ** q, 1.0)
    sw = m * comp
    sw = jnp.where(onehot > 0, 1.0, sw)
    shifted = pred + jnp.log(jnp.maximum(sw, 1e-12))
    logp = jax.nn.log_softmax(shifted, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def gaussian_focal_loss(
    pred,
    gaussian_target,
    weight=None,
    alpha: float = 2.0,
    gamma: float = 4.0,
    reduction: str = "mean",
    avg_factor=None,
):
    """CornerNet/CenterNet modified focal loss on gaussian heatmaps
    (reference ``mmdet/models/losses/gaussian_focal_loss.py``): positives are
    exact-1 pixels; elsewhere the penalty is down-weighted by
    ``(1 - target)^gamma``."""
    eps = 1e-12
    pos_w = (gaussian_target == 1.0).astype(pred.dtype)
    neg_w = (1 - gaussian_target) ** gamma
    loss = -(
        jnp.log(pred + eps) * (1 - pred) ** alpha * pos_w
        + jnp.log(1 - pred + eps) * pred**alpha * neg_w * (1 - pos_w)
    )
    return weight_reduce_loss(loss, weight, reduction, avg_factor)


def dice_loss(pred, target, eps: float = 1e-3, activate: str = "sigmoid"):
    """Dice loss (reference ``losses/dice_loss.py:9``): per-sample
    ``1 - 2<p,t>/(|p|^2+|t|^2)`` over flattened maps -> (N,)."""
    p = pred.reshape(pred.shape[0], -1).astype(jnp.float32)
    if activate == "sigmoid":
        p = jax.nn.sigmoid(p)
    t = target.reshape(target.shape[0], -1).astype(jnp.float32)
    a = jnp.sum(p * t, axis=1)
    b = jnp.sum(p * p, axis=1) + eps
    c = jnp.sum(t * t, axis=1) + eps
    return 1.0 - 2 * a / (b + c)


def kd_kl_div_loss(pred, soft_label, T: float = 10.0):
    """Knowledge-distillation KL loss (reference ``losses/kd_loss.py:12``):
    ``KL(softmax(soft/T) || softmax(pred/T)) * T^2`` per sample -> (N,)."""
    tgt = jax.nn.softmax(
        jax.lax.stop_gradient(soft_label).astype(jnp.float32) / T, axis=-1)
    logp = jax.nn.log_softmax(pred.astype(jnp.float32) / T, axis=-1)
    kl = tgt * (jnp.log(jnp.maximum(tgt, 1e-12)) - logp)
    return kl.mean(axis=-1) * (T * T)
