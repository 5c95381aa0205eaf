"""Fixed-size RoI sampling.

The reference's ``RandomSampler`` (``mmdet/core/bbox/samplers/
random_sampler.py:9``) picks a dynamic number of positives/negatives per
image.  The TPU version emits a *fixed* ``num`` slot layout per image —
sampled positives first (shuffled), then sampled negatives, then invalid
padding — so the RoI stage is one static-shape computation.  RNG parity with
torch is impossible; distributional equivalence is asserted in tests.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .assigners import AssignResult

__all__ = [
    "SampleResult",
    "random_sample",
    "pseudo_sample",
    "ohem_sample",
    "instance_balanced_sample",
    "iou_balanced_neg_sample",
    "score_hlr_sample",
]

BIG = jnp.int32(2**30)


class SampleResult(NamedTuple):
    """Fixed ``(R,)``-slot sampling output (single image)."""

    inds: jnp.ndarray  # (R,) int32 index into the candidate set
    is_pos: jnp.ndarray  # (R,) bool
    valid: jnp.ndarray  # (R,) bool (slot holds a real sample)
    gt_inds: jnp.ndarray  # (R,) int32 0-based assigned gt (pos slots)
    num_pos: jnp.ndarray  # () int32
    num_neg: jnp.ndarray  # () int32


def _rank_within(mask: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
    """0-based random rank among ``mask`` rows (others get BIG)."""
    k = jnp.where(mask, key, jnp.inf)
    order = jnp.argsort(k)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return jnp.where(mask, ranks, BIG).astype(jnp.int32)


def random_sample(
    rng: jax.Array,
    assign: AssignResult,
    cand_valid: jnp.ndarray,
    num: int = 512,
    pos_fraction: float = 0.25,
    neg_pos_ub: int = -1,
) -> SampleResult:
    """Sample ``num`` RoIs: up to ``round(num*pos_fraction)`` random
    positives, the remainder random negatives (reference
    ``random_sampler.py:60-101`` semantics on fixed shapes).

    ``assign.gt_inds`` uses -1/0/i+1 coding; candidates where
    ``cand_valid`` is False are never sampled.  ``add_gt_as_proposals`` is
    handled by the caller *prepending* gt boxes to the candidate set with
    self-assignment before calling this.
    """
    n = assign.gt_inds.shape[0]
    # truncation, not rounding — reference BaseSampler.sample() computes
    # ``int(self.num * self.pos_fraction)``
    num_expected_pos = int(num * pos_fraction)

    pos_mask = (assign.gt_inds > 0) & cand_valid
    neg_mask = (assign.gt_inds == 0) & cand_valid

    kp, kn = jax.random.split(rng)
    pos_rank = _rank_within(pos_mask, jax.random.uniform(kp, (n,)))
    neg_rank = _rank_within(neg_mask, jax.random.uniform(kn, (n,)))

    num_pos_avail = jnp.sum(pos_mask.astype(jnp.int32))
    num_pos = jnp.minimum(num_pos_avail, num_expected_pos)
    num_neg_expected = num - num_pos
    if neg_pos_ub >= 0:
        num_neg_expected = jnp.minimum(
            num_neg_expected, jnp.maximum(1, neg_pos_ub * num_pos)
        )
    num_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    num_neg = jnp.minimum(num_neg_avail, num_neg_expected)

    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    sel_neg = neg_mask & (neg_rank < num_neg_expected)

    # Slot layout: positives first (keys 0..num_pos-1), then negatives
    # (keys num_pos..), then everything else.
    key = jnp.where(
        sel_pos, pos_rank, jnp.where(sel_neg, num_pos + neg_rank, BIG)
    )
    order = jnp.argsort(key)[:num]
    slot_key = key[order]
    valid = slot_key < BIG
    inds = jnp.where(valid, order, 0).astype(jnp.int32)
    is_pos = valid & (slot_key < num_pos)
    gt_inds = jnp.where(is_pos, jnp.asarray(assign.gt_inds)[inds] - 1, 0).astype(
        jnp.int32
    )
    return SampleResult(inds, is_pos, valid, gt_inds, num_pos, num_neg)


def pseudo_sample(assign: AssignResult, cand_valid: jnp.ndarray) -> SampleResult:
    """All positives + all negatives in place (reference
    ``pseudo_sampler.py:10``) — identity slot layout, used by the RPN."""
    n = assign.gt_inds.shape[0]
    pos = (assign.gt_inds > 0) & cand_valid
    neg = (assign.gt_inds == 0) & cand_valid
    inds = jnp.arange(n, dtype=jnp.int32)
    gt_inds = jnp.where(pos, assign.gt_inds - 1, 0).astype(jnp.int32)
    return SampleResult(
        inds,
        pos,
        pos | neg,
        gt_inds,
        jnp.sum(pos.astype(jnp.int32)),
        jnp.sum(neg.astype(jnp.int32)),
    )


def ohem_sample(
    assign: AssignResult,
    cand_valid: jnp.ndarray,
    cand_loss: jnp.ndarray,
    num: int = 512,
    pos_fraction: float = 0.25,
) -> SampleResult:
    """OHEM sampling (reference ``mmdet/core/bbox/samplers/ohem_sampler.py``):
    hardest positives and negatives by current per-candidate loss instead of
    random keys.  The caller computes ``cand_loss`` with a preliminary head
    forward (same two-pass structure as the reference)."""
    n = assign.gt_inds.shape[0]
    # truncation, not rounding — reference BaseSampler.sample() computes
    # ``int(self.num * self.pos_fraction)``
    num_expected_pos = int(num * pos_fraction)
    pos_mask = (assign.gt_inds > 0) & cand_valid
    neg_mask = (assign.gt_inds == 0) & cand_valid
    # rank by descending loss within each group
    pos_rank = _rank_within(pos_mask, -cand_loss)
    neg_rank = _rank_within(neg_mask, -cand_loss)
    num_pos = jnp.minimum(
        jnp.sum(pos_mask.astype(jnp.int32)), num_expected_pos
    )
    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    sel_neg = neg_mask & (neg_rank < num - num_pos)
    key = jnp.where(sel_pos, pos_rank, jnp.where(sel_neg, num_pos + neg_rank, BIG))
    order = jnp.argsort(key)[:num]
    slot_key = key[order]
    valid = slot_key < BIG
    inds = jnp.where(valid, order, 0).astype(jnp.int32)
    is_pos = valid & (slot_key < num_pos)
    gt_inds = jnp.where(is_pos, jnp.asarray(assign.gt_inds)[inds] - 1, 0).astype(
        jnp.int32
    )
    num_neg = jnp.sum(sel_neg.astype(jnp.int32))
    return SampleResult(inds, is_pos, valid, gt_inds, num_pos, num_neg)


def _assemble(assign, sel_pos, pos_key, sel_neg, neg_key, num):
    """Common slot assembly: positives first (by pos_key), then negatives."""
    num_pos = jnp.sum(sel_pos.astype(jnp.int32))
    num_neg = jnp.sum(sel_neg.astype(jnp.int32))
    pos_rank = _rank_within(sel_pos, pos_key)
    neg_rank = _rank_within(sel_neg, neg_key)
    key = jnp.where(
        sel_pos, pos_rank, jnp.where(sel_neg, num_pos + neg_rank, BIG)
    )
    order = jnp.argsort(key)[:num]
    slot_key = key[order]
    valid = slot_key < BIG
    inds = jnp.where(valid, order, 0).astype(jnp.int32)
    is_pos = valid & (slot_key < num_pos)
    gt_inds = jnp.where(
        is_pos, jnp.asarray(assign.gt_inds)[inds] - 1, 0
    ).astype(jnp.int32)
    return SampleResult(inds, is_pos, valid, gt_inds, num_pos, num_neg)


def instance_balanced_sample(
    rng: jax.Array,
    assign: AssignResult,
    cand_valid: jnp.ndarray,
    num: int = 512,
    pos_fraction: float = 0.25,
    max_gt: int = 100,
) -> SampleResult:
    """InstanceBalancedPosSampler (reference
    ``samplers/instance_balanced_pos_sampler.py``): positives are drawn
    round-robin across gt instances so no single instance dominates;
    negatives are uniform random."""
    n = assign.gt_inds.shape[0]
    num_expected_pos = int(num * pos_fraction)
    pos_mask = (assign.gt_inds > 0) & cand_valid
    neg_mask = (assign.gt_inds == 0) & cand_valid
    kp, kn = jax.random.split(rng)
    u = jax.random.uniform(kp, (n,))
    # within-instance random rank
    inst = jnp.clip(assign.gt_inds - 1, 0, max_gt - 1)
    within = jnp.zeros((n,), jnp.int32)
    for g in range(max_gt):
        m = pos_mask & (inst == g)
        within = jnp.where(m, _rank_within(m, u), within)
    # round-robin key: first everyone's rank-0 sample, then rank-1, ...
    rr_key = within.astype(jnp.float32) * max_gt + inst.astype(jnp.float32)
    rr_rank = _rank_within(pos_mask, rr_key)
    sel_pos = pos_mask & (rr_rank < num_expected_pos)
    num_pos = jnp.sum(sel_pos.astype(jnp.int32))
    neg_rank = _rank_within(neg_mask, jax.random.uniform(kn, (n,)))
    sel_neg = neg_mask & (neg_rank < num - num_pos)
    return _assemble(assign, sel_pos, rr_key, sel_neg,
                     jax.random.uniform(kn, (n,)), num)


def iou_balanced_neg_sample(
    rng: jax.Array,
    assign: AssignResult,
    cand_valid: jnp.ndarray,
    num: int = 512,
    pos_fraction: float = 0.25,
    num_bins: int = 3,
    floor_thr: float = 0.0,
    ceil_thr: float = 0.5,
) -> SampleResult:
    """IoUBalancedNegSampler (reference
    ``samplers/iou_balanced_neg_sampler.py``, Libra R-CNN): negatives are
    drawn evenly from IoU bins in [floor_thr, ceil_thr) so hard negatives
    (high-IoU background) are not swamped by easy ones."""
    n = assign.gt_inds.shape[0]
    num_expected_pos = int(num * pos_fraction)
    pos_mask = (assign.gt_inds > 0) & cand_valid
    neg_mask = (assign.gt_inds == 0) & cand_valid
    kp, kn = jax.random.split(rng)
    pos_rank = _rank_within(pos_mask, jax.random.uniform(kp, (n,)))
    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    num_pos = jnp.sum(sel_pos.astype(jnp.int32))

    iou = jnp.clip(assign.max_overlaps, floor_thr, ceil_thr - 1e-6)
    binw = (ceil_thr - floor_thr) / num_bins
    bin_id = ((iou - floor_thr) / binw).astype(jnp.int32)
    u = jax.random.uniform(kn, (n,))
    within = jnp.zeros((n,), jnp.int32)
    for b in range(num_bins):
        m = neg_mask & (bin_id == b)
        within = jnp.where(m, _rank_within(m, u), within)
    # round-robin across bins: one from each bin in turn
    key = within.astype(jnp.float32) * num_bins + bin_id.astype(jnp.float32)
    neg_rank = _rank_within(neg_mask, key)
    sel_neg = neg_mask & (neg_rank < num - num_pos)
    return _assemble(assign, sel_pos, jax.random.uniform(kp, (n,)),
                     sel_neg, key, num)


def score_hlr_sample(
    rng: jax.Array,
    assign: AssignResult,
    cand_valid: jnp.ndarray,
    neg_scores: jnp.ndarray,  # (N,) max foreground prob per candidate
    num: int = 512,
    pos_fraction: float = 0.25,
    score_fraction: float = 0.5,
) -> SampleResult:
    """ScoreHLRSampler (reference ``samplers/score_hlr_sampler.py``,
    simplified to its sampling rule): a ``score_fraction`` share of the
    negatives are the highest-scoring (hardest) ones, the rest uniform
    random — the hierarchical local-rank loss reweighting stays with the
    consumer."""
    n = assign.gt_inds.shape[0]
    num_expected_pos = int(num * pos_fraction)
    pos_mask = (assign.gt_inds > 0) & cand_valid
    neg_mask = (assign.gt_inds == 0) & cand_valid
    kp, kn = jax.random.split(rng)
    pos_rank = _rank_within(pos_mask, jax.random.uniform(kp, (n,)))
    sel_pos = pos_mask & (pos_rank < num_expected_pos)
    num_pos = jnp.sum(sel_pos.astype(jnp.int32))
    num_neg_expected = num - num_pos
    n_hard = (num_neg_expected.astype(jnp.float32) * score_fraction).astype(
        jnp.int32
    )
    hard_rank = _rank_within(neg_mask, -neg_scores)
    sel_hard = neg_mask & (hard_rank < n_hard)
    rand_rank = _rank_within(
        neg_mask & ~sel_hard, jax.random.uniform(kn, (n,))
    )
    sel_rand = neg_mask & ~sel_hard & (
        rand_rank < (num_neg_expected - n_hard)
    )
    sel_neg = sel_hard | sel_rand
    neg_key = jnp.where(sel_hard, hard_rank.astype(jnp.float32),
                        1e6 + rand_rank.astype(jnp.float32))
    return _assemble(assign, sel_pos, jax.random.uniform(kp, (n,)),
                     sel_neg, neg_key, num)
