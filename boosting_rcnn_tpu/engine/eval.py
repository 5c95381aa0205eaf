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

    full_image_masks = getattr(detector, "full_image_masks", False)
    results: List[Tuple[np.ndarray, np.ndarray]] = []
    t0 = time.time()
    n_batches = 0
    for batch in loader.epoch_iter(0):
        ori_shape = batch.pop("ori_shape", None)
        from ..utils.transfer import chunked_device_put

        jb = {
            k: chunked_device_put(v)
            for k, v in batch.items()
            if k != "gt_mask_crops"
        }
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
                mi = masks[i][m]
                if full_image_masks and ori_shape is not None:
                    # SOLO native rasters -> original-image bitmaps
                    from ..data.mask_utils import full_masks_to_bitmaps

                    mi = full_masks_to_bitmaps(
                        mi, np.asarray(batch["img_shape"][i]),
                        np.asarray(ori_shape[i]),
                        stride=getattr(detector, "mask_stride", 4),
                    )
                results.append((dets[i][m], labels[i][m], mi))
            else:
                results.append((dets[i][m], labels[i][m]))
        n_batches += 1
        if logger and n_batches % log_every == 0:
            logger.info(
                f"eval batch {n_batches}, {len(results)} imgs, "
                f"{len(results)/(time.time()-t0):.1f} img/s"
            )
    return results


def run_eval_tta(
    detector,
    variables,
    dataset,
    batch_size: int,
    scales,  # list of short sides, e.g. [600, 800, 1000]
    long_side: int = 1333,
    flip: bool = True,
    log_every: int = 20,
    logger=None,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Multi-scale + flip TTA evaluation (reference ``MultiScaleFlipAug``,
    ``test_time_aug.py:11``).

    One loader per scale (fixed canvas per scale -> static shapes), iterated
    in lockstep over the same deterministic test order; the per-batch views
    feed ``aug_predict_multi`` which merges proposals and averages
    scores/boxes across views (``merge_augs.py`` semantics)."""
    from ..data.loader import DetDataLoader
    from ..models.detectors.two_stage import aug_predict_multi

    def canvas_for(short):
        return (int(np.ceil(short / 32)) * 32, int(np.ceil(long_side / 32)) * 32)

    loaders = [
        DetDataLoader(
            dataset, batch_size=batch_size, canvas=canvas_for(s),
            scale=(long_side, s), train=False,
        )
        for s in scales
    ]
    anchors_per_canvas = {}
    predict_cache = {}

    def get_predict(canvases):
        """One compiled program per (ordered) canvas-shape tuple; the static
        per-view anchors/level-counts/flip flags are closed over."""
        if canvases in predict_cache:
            return predict_cache[canvases]
        metas = []
        for canvas in canvases:
            if canvas not in anchors_per_canvas:
                anchors_per_canvas[canvas] = detector.anchors_for(canvas)
            anchors, nla = anchors_per_canvas[canvas]
            metas.append((anchors, nla, False))
            if flip:
                metas.append((anchors, nla, True))

        @jax.jit
        def predict(v, batches):
            views = []
            i = 0
            for b in batches:
                views.append((b, *metas[i]))
                i += 1
                if flip:
                    views.append((b, *metas[i]))
                    i += 1
            return aug_predict_multi(detector, v, views, rescale=True)

        predict_cache[canvases] = predict
        return predict

    results: List[Tuple[np.ndarray, np.ndarray]] = []
    t0 = time.time()
    n_batches = 0
    iters = [ld.epoch_iter(0) for ld in loaders]
    while True:
        batches = []
        done = False
        for it in iters:
            b = next(it, None)
            if b is None:
                done = True
                break
            b.pop("ori_shape", None)
            batches.append(
                {k: jnp.asarray(v) for k, v in b.items()
                 if k != "gt_mask_crops"}
            )
        if done:
            break
        canvases = tuple(
            (int(b["images"].shape[1]), int(b["images"].shape[2]))
            for b in batches
        )
        predict = get_predict(canvases)
        dets, labels, valid = map(np.asarray, predict(variables, batches))
        for i in range(dets.shape[0]):
            m = valid[i]
            results.append((dets[i][m], labels[i][m]))
        n_batches += 1
        if logger and n_batches % log_every == 0:
            logger.info(
                f"tta eval batch {n_batches}, {len(results)} imgs, "
                f"{len(results)/(time.time()-t0):.1f} img/s"
            )
    return results
