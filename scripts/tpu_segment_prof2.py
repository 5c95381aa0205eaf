"""Round-2 segment profiler: the 93ms residual (assignment, RoI stage,
NMS tile variants).  Same K-delta chained method as tpu_segment_prof.py."""
import json
import os
import sys
import time

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
    va = {"params": params, **({"batch_stats": bstats} if bstats else {})}

    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    rs = np.random.RandomState(0)
    images = chunked_device_put(
        rs.rand(BATCH, *CANVAS, 3).astype(np.float32))
    img_shape = jnp.asarray([[CANVAS[0], CANVAS[1] - 11]] * BATCH,
                            jnp.float32)

    feats = det.net.apply(va, images, method="features")
    feats = jax.tree.map(jax.lax.stop_gradient, feats)
    flat_cls, flat_reg, flat_iou = det._rpn_flat(va, feats)
    flat_cls, flat_reg, flat_iou = jax.tree.map(
        jax.lax.stop_gradient, (flat_cls, flat_reg, flat_iou))
    roi_feats = jax.tree.map(jax.lax.stop_gradient,
                             getattr(det, "_roi_feats", feats))
    jax.block_until_ready(flat_cls)

    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    loader = FakeDetLoader(batch_size=BATCH, canvas=CANVAS, num_classes=4,
                           num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}

    results = {}

    # ---- A: RPN loss (targets/assignment only, outputs fixed) ----
    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        atss_rpn_loss,
    )

    av = jnp.ones_like(flat_cls, dtype=bool)

    def rpn_targets(eps, fc, fr, fi):
        ls = atss_rpn_loss(
            det.rpn_cfg, fc + eps, fr, fi, anchors, av,
            tb["gt_bboxes"], tb["gt_mask"], num_level_anchors=tuple(nla),
        )
        return sum(jnp.asarray(v).sum() for v in ls.values()) * 1e-12

    results["rpn_assign_loss_fwd"] = k_delta(
        lambda K: chain_scalar(rpn_targets, K), flat_cls, flat_reg, flat_iou)
    print(json.dumps(results), flush=True)

    # ---- B: RoI stage (sample + align + head + loss) fwd+bwd ----
    props = det._proposals(flat_cls, flat_reg, flat_iou, anchors, nla,
                           tb["img_shape"], det.train_proposal_cfg)
    props = jax.tree.map(jax.lax.stop_gradient, props)
    jax.block_until_ready(props)
    prop_boxes, prop_scores, prop_valid = props

    from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet
    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        RoISample, prob_roi_loss, sample_rois,
    )

    def roi_stage(eps, fts, pb, ps, pv):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            rngs = jax.random.split(jax.random.PRNGKey(0), BATCH)
            sample = jax.vmap(
                lambda r_, b_, s_, v_, gb, gm, gl: sample_rois(
                    det.roi_cfg, r_, b_ + eps, s_, v_, gb, gm, gl)
            )(rngs, pb, ps, pv, tb["gt_bboxes"], tb["gt_mask"],
              tb["gt_labels"])
            cls_s, reg_s = det.net.apply(
                v2, fts, sample.boxes, sample.valid,
                method=TwoStageNet.roi_out)
            flat = RoISample(*[
                x.reshape((-1,) + x.shape[2:]) for x in sample])
            ls = prob_roi_loss(det.roi_cfg, det.bbox_cfg, cls_s, reg_s, flat)
            return ls["loss_cls"] + ls["loss_bbox"]
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    results["roi_stage_fwdbwd"] = k_delta(
        lambda K: chain_scalar(roi_stage, K),
        roi_feats, prop_boxes, prop_scores, prop_valid)
    print(json.dumps(results), flush=True)

    # ---- C: RoI align alone fwd + bwd wrt feats ----
    align = det.net._roi_align_fn(inference=False)

    def align_fwdbwd(eps, fts, pb, pv):
        def lf(fts2):
            pooled = jax.vmap(
                lambda fl, rb, vb: align(
                    fl, rb, vb, det.net.roi_strides,
                    out_size=det.net.roi_out_size,
                    sample_num=det.net.roi_sample_num,
                    finest_scale=det.net.roi_finest_scale,
                    num_route_levels=len(det.net.roi_strides))
            )(tuple(f + eps for f in fts2), pb, pv)
            return pooled.astype(jnp.float32).sum()
        g = jax.grad(lf)(fts)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    results["roi_align_fwdbwd"] = k_delta(
        lambda K: chain_scalar(align_fwdbwd, K),
        roi_feats, prop_boxes[:, :512], prop_valid[:, :512])
    print(json.dumps(results), flush=True)

    # ---- D: NMS tile-size variants on the live candidate set ----
    from boosting_rcnn_tpu.ops.nms import batched_nms_padded

    n_cand = 4000 * 2 + 1050 + 273 + 70  # per-level topk concat at 800x1344
    cand_boxes = jnp.asarray(
        rs.rand(BATCH, 9393, 4).astype(np.float32)) * 500
    cand_boxes = cand_boxes.at[..., 2:].add(cand_boxes[..., :2])
    cand_scores = jnp.asarray(rs.rand(BATCH, 9393).astype(np.float32))
    cand_ids = jnp.asarray(
        rs.randint(0, 5, (BATCH, 9393)).astype(np.int32))

    for tile in (256, 512, 1024):
        def nms_seg(eps, bx, sc, ids, _tile=tile):
            def one(b_, s_, i_):
                ob, os_, ov, oi = batched_nms_padded(
                    b_, s_ + eps, i_, 0.7, 2000, tile=_tile)
                return ob.astype(jnp.float32).sum() + os_.sum()
            return jax.vmap(one)(bx, sc, ids).sum() * 1e-12

        results[f"nms_tile{tile}"] = k_delta(
            lambda K, f=nms_seg: chain_scalar(f, K),
            cand_boxes, cand_scores, cand_ids)
        print(json.dumps(results), flush=True)

    print("FINAL " + json.dumps(
        {k: round(v * 1000, 2) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
