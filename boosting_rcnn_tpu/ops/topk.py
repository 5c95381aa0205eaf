"""Top-k selection with an opt-in TPU-approximate path.

The RPN proposal stage selects the top ``nms_pre`` candidates per FPN
level (reference ``mmdet/models/dense_heads/rpn_head.py``
``_get_bboxes_single`` / the boosting RPN at
``mmdet/models/dense_heads/atss_rpn_head.py:688-760``).  The reference
uses exact ``torch.topk``; on a v5e the exact ``lax.top_k`` over the
151_200-anchor level-0 set lowers to a full key-value sort
(~1.6 ms/step at bs8 — docs/TRAIN_PERF.md remaining-op budget).

``jax.lax.approx_max_k`` maps onto the TPU PartialReduce unit at a
measured recall of 0.9937 against target 0.95
(``scripts/tpu_topk_microbench.py``), but it is a *behavioral
deviation* from the reference's exact top-k — so it is OFF by default
everywhere and only enabled through the explicit ``approx_topk=True``
proposal-config key (``train_cfg.rpn_proposal`` /
``test_cfg.rpn``).  On non-TPU backends ``approx_max_k`` falls back to
the exact algorithm, so CPU tests of the gated path are exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def select_topk(
    scores: jnp.ndarray,
    k: int,
    approx: bool = False,
    recall_target: float = 0.95,
):
    """Return ``(values, indices)`` of the top-``k`` scores (1-D input).

    ``approx=False`` (default) is exact ``lax.top_k`` — reference
    semantics.  ``approx=True`` uses ``lax.approx_max_k`` (TPU
    PartialReduce; exact fallback elsewhere) and trades guaranteed
    exactness for the measured ~1.3 ms/step saving documented in
    docs/TRAIN_PERF.md.
    """
    # clamp: lax.top_k raises for k > n, and an oversized request can
    # only mean "take everything" — keep the contract total
    k = min(k, scores.shape[-1])
    if k == scores.shape[-1]:
        # nothing to select; both paths degenerate to a sort of the
        # whole set — keep exact semantics
        return jax.lax.top_k(scores, k)
    if approx:
        return jax.lax.approx_max_k(scores, k, recall_target=recall_target)
    return jax.lax.top_k(scores, k)
