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
    x = jax.random.normal(jax.random.PRNGKey(2), (20000,))
    k = 500
    av, ai = select_topk(x, k, approx=True, recall_target=0.95)
    _, ei = jax.lax.top_k(x, k)
    exact = set(np.asarray(ei).tolist())
    got = set(np.asarray(ai).tolist())
    recall = len(exact & got) / k
    assert recall >= 0.95
    # values must be genuine entries of x at their indices
    np.testing.assert_allclose(
        np.asarray(av), np.asarray(x)[np.asarray(ai)], rtol=1e-6
    )


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
