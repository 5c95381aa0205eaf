"""TPU-native NMS on fixed-shape padded tensors.

Design
------
The reference calls mmcv's CUDA ``nms``/``batched_nms`` on dynamically sized
box lists (``mmdet/core/post_processing/bbox_nms.py:8-95``,
``mmdet/models/dense_heads/atss_rpn_head.py:756``).  On TPU, dynamic shapes
force recompiles and serial kernels, so everything here operates on padded
``(N, 4)`` tensors with validity masks and returns padded results plus masks.

The algorithm is the tiled greedy NMS used by large-batch accelerator NMS
implementations: sort by score, process boxes in tiles of ``T``; each tile is
first suppressed by all earlier *surviving* boxes (one `(T, N)` IoU block —
regular, vectorizable work), then an in-tile fix-point iteration resolves the
sequential dependency exactly.  The result equals sequential greedy NMS while
doing O(N^2/T) *vector* steps instead of O(N) *scalar* steps.

All functions are single-image; batch with ``jax.vmap``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .box_ops import bbox_overlaps

__all__ = [
    "nms_padded",
    "batched_nms_padded",
    "multiclass_nms_padded",
    "soft_nms_padded",
]

NEG_INF = -1e30


def _pad_to_multiple(x: jnp.ndarray, multiple: int, axis: int, value):
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _self_suppress(over: jnp.ndarray, init_alive: jnp.ndarray) -> jnp.ndarray:
    """Exact greedy suppression within one tile.

    ``over[j, k]`` is True when box j (earlier in score order) overlaps box k
    above threshold (strictly upper-triangular).  Iterating
    ``a <- init & ~any_j(a_j & over[j, k])`` from ``a = init`` converges to
    the greedy solution (antitone map; the alternating sequence collapses onto
    the unique greedy fix-point in at most chain-depth steps).
    """
    tile = over.shape[0]

    def body(state):
        it, a, _ = state
        new_a = init_alive & ~jnp.any(over & a[:, None], axis=0)
        return it + 1, new_a, a

    def cond(state):
        it, a, prev = state
        return jnp.logical_and(it < tile, jnp.any(a != prev))

    _, alive, _ = lax.while_loop(cond, body, (0, init_alive, ~init_alive))
    return alive


def nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over padded ``(N, 4)`` boxes.

    Returns ``(out_boxes (max_out,4), out_scores (max_out,), out_valid
    (max_out,), out_idx (max_out,))`` where ``out_idx`` indexes into the input
    and outputs are in descending score order; invalid slots have score
    ``NEG_INF`` and index 0.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, NEG_INF)

    tile = min(tile, max(8, n))
    boxes_p = _pad_to_multiple(boxes, tile, 0, 0.0)
    s_p = _pad_to_multiple(s, tile, 0, NEG_INF)
    np_ = boxes_p.shape[0]

    order = jnp.argsort(-s_p)
    boxes_s = boxes_p[order]
    s_s = s_p[order]
    alive0 = s_s > NEG_INF / 2

    num_tiles = np_ // tile
    idx_all = jnp.arange(np_)
    idx_tile = jnp.arange(tile)
    tri = idx_tile[:, None] < idx_tile[None, :]

    # Suppression can only come from *surviving* earlier boxes, and the loop
    # exits once ``max_out`` survive — so each tile only ever needs IoU
    # against a compacted (max_out + tile)-row buffer of survivors, not
    # against all N candidates.  This cuts the dominant (tile, N) IoU block
    # to (tile, K): ~6x less work at train geometry (K 2.2k vs N 16k), ~8x
    # at test geometry (K 0.5k vs N 5k).  Exactness: entering a tile,
    # kept_cnt < max_out (loop condition), so the compaction position of any
    # tile survivor is < max_out + tile <= kbuf — no survivor is ever
    # dropped while the loop is still running.
    kbuf = min(-(-(max_out + tile) // 128) * 128, np_)
    kidx = jnp.arange(kbuf)

    def tile_body(state):
        i, alive, kept_boxes, kept_cnt = state
        start = i * tile
        tb = lax.dynamic_slice(boxes_s, (start, 0), (tile, 4))
        t_alive = lax.dynamic_slice(alive, (start,), (tile,))
        iou_prev = bbox_overlaps(tb, kept_boxes)  # (tile, kbuf)
        sup_prev = jnp.any(
            (iou_prev > iou_threshold) & (kidx < kept_cnt)[None, :], axis=1
        )
        t_alive = t_alive & ~sup_prev
        iou_t = bbox_overlaps(tb, tb)
        over = (iou_t > iou_threshold) & tri
        t_alive = _self_suppress(over, t_alive)
        alive = lax.dynamic_update_slice(alive, t_alive, (start,))
        pos = kept_cnt + jnp.cumsum(t_alive.astype(jnp.int32)) - 1
        pos = jnp.where(t_alive, pos, kbuf)  # invalid rows drop
        kept_boxes = kept_boxes.at[pos].set(tb, mode="drop")
        kept_cnt = kept_cnt + jnp.sum(t_alive.astype(jnp.int32))
        return i + 1, alive, kept_boxes, kept_cnt

    def tile_cond(state):
        # Early exit: survivors only accumulate in score order and later
        # tiles can never resurrect earlier boxes, so once ``max_out``
        # survivors exist the output set is final.
        i, alive, kept_boxes, kept = state
        return jnp.logical_and(i < num_tiles, kept < max_out)

    # On early exit, boxes in unprocessed (lower-score) tiles are still
    # flagged alive, but they rank strictly after the >= max_out processed
    # survivors, so the [:max_out] compaction below can never select them.
    _, alive, _, _ = lax.while_loop(
        tile_cond, tile_body,
        (0, alive0, jnp.zeros((kbuf, 4), boxes_s.dtype), jnp.int32(0)),
    )

    # Compact: rank alive boxes (already score-sorted) to the front.
    rank = jnp.cumsum(alive.astype(jnp.int32)) - 1
    key = jnp.where(alive, rank, np_ + idx_all)
    take = jnp.argsort(key)[:max_out]
    out_boxes = boxes_s[take]
    out_scores = s_s[take]
    out_valid = alive[take]
    out_idx = jnp.where(out_valid, order[take], 0)
    out_scores = jnp.where(out_valid, out_scores, NEG_INF)
    return out_boxes, out_scores, out_valid, out_idx


def batched_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
):
    """Category/level-aware NMS via the coordinate-offset trick
    (reference: ``bbox_nms.py:86`` / torchvision ``batched_nms``)."""
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True, boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    ob, os, ov, oi = nms_padded(shifted, scores, iou_threshold, max_out, valid, tile)
    # Recover un-shifted boxes via the kept indices.
    out_boxes = jnp.where(ov[:, None], boxes[oi], 0.0)
    return out_boxes, os, ov, oi


def multiclass_nms_padded(
    bboxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    score_factors: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    pre_nms_top_k: int = 2048,
    tile: int = 256,
    nms_type: str = "nms",  # 'nms' | 'soft_nms'
    soft_sigma: float = 0.5,
    soft_min_score: float = 1e-3,
    soft_method: str = "linear",
):
    """Per-class NMS over ``(N, C)`` fg scores (bg already dropped).

    ``bboxes``: ``(N, 4)`` (shared) or ``(N, C, 4)`` (per-class).
    Mirrors reference ``multiclass_nms`` ordering exactly: threshold scores
    *before* multiplying ``score_factors`` (``bbox_nms.py:55-63``), then
    class-offset NMS, then keep top ``max_per_img``.

    Returns ``(dets (max_per_img, 5), labels (max_per_img,), valid mask)``.
    """
    n, c = scores.shape
    if bboxes.ndim == 2:
        boxes_nc = jnp.broadcast_to(bboxes[:, None, :], (n, c, 4))
    else:
        boxes_nc = bboxes
    flat_boxes = boxes_nc.reshape(n * c, 4)
    flat_scores = scores.reshape(n * c)
    flat_labels = jnp.broadcast_to(jnp.arange(c)[None, :], (n, c)).reshape(n * c)

    ok = flat_scores > score_thr
    if valid is not None:
        ok = ok & jnp.repeat(valid, c)
    if score_factors is not None:
        flat_scores = flat_scores * jnp.repeat(score_factors, c)

    # Static pre-NMS pruning: keep the top-K candidates that pass the score
    # threshold.  K is far above max_per_img; only ultra-dense scenes would
    # ever differ from exact mmdet behaviour.
    k = min(pre_nms_top_k, n * c)
    masked = jnp.where(ok, flat_scores, NEG_INF)
    top_scores, top_idx = lax.top_k(masked, k)
    top_boxes = flat_boxes[top_idx]
    top_labels = flat_labels[top_idx]
    top_valid = top_scores > NEG_INF / 2

    if nms_type == "soft_nms":
        # class-offset trick is exact for soft-NMS too: cross-class IoU = 0
        # so decay never crosses classes.
        max_coord = jnp.max(jnp.where(top_valid[:, None], top_boxes, 0.0))
        shifted = top_boxes + (
            top_labels.astype(top_boxes.dtype) * (max_coord + 1.0)
        )[:, None]
        _, os, ov, oi = soft_nms_padded(
            shifted, top_scores, max_per_img,
            iou_threshold=iou_threshold, sigma=soft_sigma,
            min_score=soft_min_score, method=soft_method, valid=top_valid,
        )
        ob = jnp.where(ov[:, None], top_boxes[oi], 0.0)
    else:
        ob, os, ov, oi = batched_nms_padded(
            top_boxes, top_scores, top_labels, iou_threshold, max_per_img,
            top_valid, tile,
        )
    out_labels = jnp.where(ov, top_labels[oi], 0)
    dets = jnp.concatenate(
        [ob, jnp.where(ov, os, 0.0)[:, None]], axis=-1
    )
    return dets, out_labels, ov


def soft_nms_padded(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    max_out: int,
    iou_threshold: float = 0.3,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",  # 'linear' | 'gaussian'
    valid: Optional[jnp.ndarray] = None,
):
    """Soft-NMS (reference option ``nms=dict(type='soft_nms', ...)`` in
    test_cfg, handled by mmcv ``soft_nms``).

    TPU-native form: soft-NMS is inherently sequential (the next pick depends
    on decayed scores), but only ``max_out`` picks are ever kept — so run
    exactly ``max_out`` argmax+decay steps, each a fixed-shape vector op.
    Identical to full soft-NMS truncated to the top ``max_out`` survivors.

    Returns (out_boxes, out_scores (decayed), out_valid, out_idx).
    """
    boxes = jnp.asarray(boxes)
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    s = jnp.where(valid, scores, NEG_INF)

    def body(state, _):
        s_cur = state
        i = jnp.argmax(s_cur)
        top_score = s_cur[i]
        top_box = boxes[i]
        ious = bbox_overlaps(top_box[None], boxes)[0]
        if method == "gaussian":
            decay = jnp.exp(-(ious**2) / sigma)
        else:
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        s_new = s_cur * decay
        s_new = s_new.at[i].set(NEG_INF)  # picked: remove from pool
        return s_new, (top_box, top_score, i)

    _, (ob, os_, oi) = lax.scan(body, s, None, length=max_out)
    ov = os_ > jnp.maximum(min_score, 0.0)
    return ob, jnp.where(ov, os_, NEG_INF), ov, jnp.where(ov, oi, 0)


def nms_match(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_threshold: float,
              valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mmcv ``nms_match``: cluster boxes into greedy-NMS groups.

    Returns (N,) int32: for every box the input index of its group's
    keeper (keepers map to themselves; invalid slots -1).  Fixed-shape
    form of the reference's list-of-index-arrays."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    _, _, kvalid, kidx = nms_padded(boxes, scores, iou_threshold, n, valid)
    # scatter keepers; invalid slots report index 0, so park them at n
    keeper = jnp.zeros((n + 1,), bool).at[
        jnp.where(kvalid, kidx, n)].set(True)[:n]
    iou = bbox_overlaps(boxes, boxes)
    s = jnp.where(valid, scores, NEG_INF)
    # each box joins the highest-scoring keeper overlapping it > thr
    cand = (iou > iou_threshold) & keeper[None, :] & valid[:, None]
    key = jnp.where(cand, s[None, :], NEG_INF)
    grp = jnp.argmax(key, axis=1).astype(jnp.int32)
    has = jnp.max(key, axis=1) > NEG_INF / 2
    grp = jnp.where(keeper, jnp.arange(n, dtype=jnp.int32), grp)
    return jnp.where(valid & (has | keeper), grp, -1)
