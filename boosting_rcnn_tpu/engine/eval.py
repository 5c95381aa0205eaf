"""Evaluation loop: batched jitted inference -> host-side COCO-style eval.

Replaces the reference's ``single_gpu_test``/``multi_gpu_test`` +
``collect_results_cpu`` (``mmdet/apis/test.py:16-346``): the per-batch
device loop is one jitted predict; multi-host gather uses
``multihost_utils.process_allgather`` instead of tmpdir pickles.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def run_eval(
    detector,
    variables,
    loader,
    anchors,
    num_level_anchors,
    log_every: int = 20,
    logger=None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Returns per-image (dets (N,5), labels (N,)) numpy results in original
    image coordinates (rescale=True path)."""

    @jax.jit
    def predict(v, batch):
        return detector.predict(v, batch, anchors, num_level_anchors, rescale=True)

    results: List[Tuple[np.ndarray, np.ndarray]] = []
    t0 = time.time()
    n_batches = 0
    for batch in loader.epoch_iter(0):
        batch.pop("ori_shape", None)
        jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "gt_mask_crops"}
        out = predict(variables, jb)
        dets, labels, valid = map(np.asarray, out[:3])
        masks = np.asarray(out[3]) if len(out) > 3 else None
        mask_scores = np.asarray(out[4]) if len(out) > 4 else None
        for i in range(dets.shape[0]):
            m = valid[i]
            if mask_scores is not None:
                results.append(
                    (dets[i][m], labels[i][m], masks[i][m], mask_scores[i][m])
                )
            elif masks is not None:
                results.append((dets[i][m], labels[i][m], masks[i][m]))
            else:
                results.append((dets[i][m], labels[i][m]))
        n_batches += 1
        if logger and n_batches % log_every == 0:
            logger.info(
                f"eval batch {n_batches}, {len(results)} imgs, "
                f"{len(results)/(time.time()-t0):.1f} img/s"
            )
    return results
