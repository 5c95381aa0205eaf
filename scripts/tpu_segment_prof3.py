"""Round-3: bisect the full-loss non-additivity (rpn-side vs roi-side)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _build
from scripts.tpu_segment_prof import BATCH, CANVAS, chain_scalar, k_delta


def main():
    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    loader = FakeDetLoader(batch_size=BATCH, canvas=CANVAS, num_classes=4,
                           num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}

    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        atss_rpn_loss,
    )
    from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet
    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        RoISample, prob_roi_loss, sample_rois,
    )

    results = {}

    def make_side(which):
        def seg(eps, imgs):
            def lf(p):
                v2 = {"params": p,
                      **({"batch_stats": bstats} if bstats else {})}
                feats = det.net.apply(v2, imgs + eps, method="features")
                cls, reg, iou = det._rpn_flat(v2, feats)
                roi_feats = getattr(det, "_roi_feats", feats)
                if which == "rpn":
                    av = jnp.ones_like(cls, dtype=bool)
                    ls = atss_rpn_loss(
                        det.rpn_cfg, cls, reg, iou, anchors, av,
                        tb["gt_bboxes"], tb["gt_mask"],
                        num_level_anchors=tuple(nla))
                    return sum(jnp.asarray(v).sum() for v in ls.values())
                props = jax.tree.map(
                    jax.lax.stop_gradient,
                    det._proposals(cls, reg, iou, anchors, nla,
                                   tb["img_shape"],
                                   det.train_proposal_cfg))
                pb, ps, pv = props
                rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
                sample = jax.vmap(
                    lambda r_, b_, s_, v_, gb, gm, gl: sample_rois(
                        det.roi_cfg, r_, b_, s_, v_, gb, gm, gl)
                )(rngs, pb, ps, pv, tb["gt_bboxes"], tb["gt_mask"],
                  tb["gt_labels"])
                cls_s, reg_s = det.net.apply(
                    v2, roi_feats, sample.boxes, sample.valid,
                    method=TwoStageNet.roi_out)
                flat = RoISample(
                    *[x.reshape((-1,) + x.shape[2:]) for x in sample])
                ls = prob_roi_loss(det.roi_cfg, det.bbox_cfg, cls_s, reg_s,
                                   flat)
                return ls["loss_cls"] + ls["loss_bbox"]
            g = jax.grad(lf)(params)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                       for l in jax.tree_util.tree_leaves(g)) * 1e-12
        return seg

    for which in ("rpn", "roi"):
        results[f"{which}_side_from_images"] = k_delta(
            lambda K, w=which: chain_scalar(make_side(w), K), tb["images"])
        print(json.dumps(results), flush=True)
    print("FINAL " + json.dumps(
        {k: round(v * 1000, 2) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
