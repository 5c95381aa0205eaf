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

__all__ = ["SampleResult", "random_sample", "pseudo_sample"]

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
