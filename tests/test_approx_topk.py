"""Opt-in approximate proposal top-k (ops/topk.py).

The reference selects top-``nms_pre`` per level with exact
``torch.topk`` (``mmdet/models/dense_heads/rpn_head.py``
``_get_bboxes_single``); ``approx_topk=True`` is a gated TPU deviation
(``lax.approx_max_k``, measured recall 0.9937 at target 0.95 —
scripts/tpu_topk_microbench.py).  These tests pin (a) exact-by-default
semantics, (b) the recall contract of the approx path (exact fallback
on CPU, so recall is checked as >= target, which the TPU kernel also
guarantees in expectation), and (c) config->ProposalCfg plumbing.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.config import load_config
from boosting_rcnn_tpu.ops.topk import select_topk

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_select_topk_exact_default():
    x = jax.random.normal(jax.random.PRNGKey(0), (4096,))
    v, i = select_topk(x, 256)
    ev, ei = jax.lax.top_k(x, 256)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(ev))


def test_select_topk_k_covers_all():
    x = jax.random.normal(jax.random.PRNGKey(1), (64,))
    v, i = select_topk(x, 64, approx=True)  # degenerate: stays exact
    ev, ei = jax.lax.top_k(x, 64)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))


def test_select_topk_approx_recall():
    """Plumbing smoke check.  On CPU ``approx_max_k`` falls back to the
    exact algorithm, so recall here is exactly 1.0 — asserted as such to
    keep this test honest about what it exercises (the real
    PartialReduce recall, 0.9937 at target 0.95, is validated on-chip by
    ``scripts/tpu_topk_microbench.py``)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (20000,))
    k = 500
    av, ai = select_topk(x, k, approx=True, recall_target=0.95)
    _, ei = jax.lax.top_k(x, k)
    exact = set(np.asarray(ei).tolist())
    got = set(np.asarray(ai).tolist())
    recall = len(exact & got) / k
    on_cpu = jax.devices()[0].platform == "cpu"
    assert recall == 1.0 if on_cpu else recall >= 0.95
    # values must be genuine entries of x at their indices
    np.testing.assert_allclose(
        np.asarray(av), np.asarray(x)[np.asarray(ai)], rtol=1e-6
    )


def test_select_topk_oversized_k_clamps():
    """k > n must clamp to n (lax.top_k would raise), keeping the
    contract total for future callers."""
    x = jax.random.normal(jax.random.PRNGKey(4), (64,))
    for approx in (False, True):
        v, i = select_topk(x, 100, approx=approx)
        assert v.shape == (64,) and i.shape == (64,)
        ev, ei = jax.lax.top_k(x, 64)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))


def test_recall_target_plumbs_from_config():
    """ADVICE r4: recall_target is tunable from the config, like the
    approx_topk gate itself (ProposalCfg.topk_recall_target)."""
    cfg = load_config(
        os.path.join(
            REPO,
            "configs/boosting_rcnn/"
            "boosting_rcnn_r50_pafpn_1x_utdac_approx_topk.py",
        )
    )
    d = cfg.model.to_dict()
    d["train_cfg"]["rpn_proposal"]["topk_recall_target"] = 0.9
    det = build_detector(d)
    assert det.train_proposal_cfg.topk_recall_target == 0.9
    # default stays 0.95
    assert det.test_proposal_cfg.topk_recall_target == 0.95


def test_proposals_identical_on_cpu_fallback():
    """On CPU approx_max_k falls back to exact: the gated path must
    produce the same proposal set as the default path (up to ties,
    absent with continuous random scores)."""
    from boosting_rcnn_tpu.models.dense_heads.rpn_head import (
        RPNCfg,
        rpn_proposals,
    )

    rng = jax.random.PRNGKey(3)
    nla = [1024, 256, 64]
    A = sum(nla)
    k1, k2, k3 = jax.random.split(rng, 3)
    cls = jax.random.normal(k1, (A,))
    deltas = jax.random.normal(k2, (A, 4)) * 0.1
    # anchors: random well-formed boxes on a 128x128 canvas
    ctr = jax.random.uniform(k3, (A, 2)) * 100 + 10
    anchors = jnp.concatenate([ctr - 8.0, ctr + 8.0], axis=-1)
    shape = jnp.array([128.0, 128.0])
    cfg = RPNCfg()
    out_exact = rpn_proposals(
        cfg, cls, deltas, anchors, nla, shape, nms_pre=200, max_per_img=64
    )
    out_approx = rpn_proposals(
        cfg, cls, deltas, anchors, nla, shape, nms_pre=200, max_per_img=64,
        approx_topk=True,
    )
    for a, b in zip(out_exact, out_approx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_config_gate_plumbs_to_proposal_cfg():
    cfg = load_config(
        os.path.join(
            REPO,
            "configs/boosting_rcnn/"
            "boosting_rcnn_r50_pafpn_1x_utdac_approx_topk.py",
        )
    )
    det = build_detector(cfg.model.to_dict())
    assert det.train_proposal_cfg.approx_topk is True
    assert det.test_proposal_cfg.approx_topk is True
    # the base flagship stays exact
    base = load_config(
        os.path.join(
            REPO,
            "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py",
        )
    )
    det0 = build_detector(base.model.to_dict())
    assert det0.train_proposal_cfg.approx_topk is False
    assert det0.test_proposal_cfg.approx_topk is False
