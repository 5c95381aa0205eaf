"""Round-3 train-step gap hunt.

The split experiment (tpu_train_split.py) showed proposal-NMS placement is
irrelevant (fused == outside_grad == stale == ~180ms; two-dispatch loses),
refuting the round-2 serialization hypothesis.  This profile isolates the
remaining suspects with K-delta chained timing (bs8, 800x1344, bf16):

  roi_params_only   grad wrt params, feats STOPPED (r2's 8ms measurement)
  roi_live_feats    grad wrt params, feats live (adds the feature-cotangent
                    path: RoIAlign bwd + head bwd into FPN into backbone)
  sample_rois_fwd   vmapped assignment+sampling on fixed proposals
  rpn_side_live     backbone+tower+ATSS loss grad (r2: 90.6 vs 77 parts)
  roi_side_live     backbone+roi stage grad with PRECOMPUTED sample (the
                    r2 139.5ms segment minus proposal+sample generation)
  full_loss         the whole thing (r2: 172)
"""
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

BATCH = int(os.environ.get("PROF_BATCH", "8"))
CANVAS = (800, 1344)
K_LO, K_HI = 2, 8
ONLY = os.environ.get("PROF_ONLY", "").split(",") if os.environ.get("PROF_ONLY") else None


def k_delta(make_chain, *args):
    ts = {}
    for k in (K_LO, K_HI):
        fn = make_chain(k)
        r = fn(*args)
        jax.block_until_ready(r)
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            jax.block_until_ready(r)
            reps.append(time.perf_counter() - t0)
        ts[k] = min(reps)
    return (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO)


def chain_scalar(seg, K):
    @jax.jit
    def run(*args):
        def body(i, s):
            return s * 1e-30 + seg(s * 1e-30, *args)

        return jax.lax.fori_loop(0, K, body, 0.0)

    return run


def main():
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet
    from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import (
        RoISample,
        prob_roi_loss,
    )
    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})
    va = {"params": params, **({"batch_stats": bstats} if bstats else {})}

    rs = np.random.RandomState(0)
    images = chunked_device_put(rs.rand(BATCH, *CANVAS, 3).astype(np.float32))
    loader = FakeDetLoader(batch_size=BATCH, canvas=CANVAS, num_classes=4,
                           num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}
    tb["images"] = images
    rng = jax.random.PRNGKey(0)

    # fixed RoISample (what loss would build internally)
    sample = jax.jit(
        lambda v, b: det.train_sample(v, rng, b, anchors, nla)
    )(va, tb)
    sample = jax.tree.map(jax.lax.stop_gradient, sample)
    jax.block_until_ready(sample)
    feats_fixed = jax.jit(
        lambda v, im: det.net.apply(v, im, method=TwoStageNet.features)
    )(va, images)
    jax.block_until_ready(feats_fixed)

    results = {}

    def flat_of(s):
        return RoISample(*[x.reshape((-1,) + x.shape[2:]) for x in s])

    def roi_loss_from(v2, feats):
        cls_s, reg_s = det.net.apply(
            v2, feats, sample.boxes, sample.valid, method=TwoStageNet.roi_out)
        ls = prob_roi_loss(det.roi_cfg, det.bbox_cfg, cls_s, reg_s,
                           flat_of(sample))
        return sum(jnp.asarray(x).sum() for x in ls.values())

    def measure(name, seg, *args):
        if ONLY and name not in ONLY:
            return
        results[name] = k_delta(lambda K: chain_scalar(seg, K), *args)
        print(json.dumps({name: round(results[name] * 1000, 2)}), flush=True)

    # 1: roi stage grad wrt params, feats stopped
    def roi_params_only(eps, fts):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            return roi_loss_from(v2, tuple(f + eps for f in fts))
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    measure("roi_params_only", roi_params_only,
            jax.tree.map(jax.lax.stop_gradient, feats_fixed))

    # 2: roi stage with live feats (no backbone): cotangent into feats
    def roi_live_feats(eps, fts):
        def lf(args):
            p, fts2 = args
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            return roi_loss_from(v2, tuple(f + eps for f in fts2))
        g = jax.grad(lf)((params, fts))
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    measure("roi_live_feats", roi_live_feats, feats_fixed)

    # 3: assignment + sampling forward on fixed rpn outputs
    flat_cls, flat_reg, flat_iou = det._rpn_flat(va, feats_fixed)
    jax.block_until_ready(flat_cls)

    def sample_fwd(eps, fc, fr, fi):
        s = det.sample_from_rpn_outs(
            rng, (fc + eps, fr, fi), tb, anchors, nla)
        return sum(x.astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(s)) * 1e-12

    measure("proposals_and_sample_fwd", sample_fwd,
            flat_cls, flat_reg, flat_iou)

    # 4: rpn side live (backbone + tower + atss loss)
    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        atss_rpn_loss,
    )

    def rpn_side_live(eps, imgs):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            feats = det.net.apply(v2, imgs + eps,
                                  method=TwoStageNet.features)
            cls, reg, iou = det._rpn_flat(v2, feats)
            valid = jnp.ones((BATCH, anchors.shape[0]), bool)
            ls = atss_rpn_loss(det.rpn_cfg, cls, reg, iou, anchors, valid,
                               tb["gt_bboxes"], tb["gt_mask"], nla)
            return sum(jnp.asarray(x).sum() for x in ls.values())
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    measure("rpn_side_live", rpn_side_live, images)

    # 5: roi side live through the backbone, sample precomputed
    def roi_side_live(eps, imgs):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            feats = det.net.apply(v2, imgs + eps,
                                  method=TwoStageNet.features)
            return roi_loss_from(v2, feats)
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    measure("roi_side_live_fixed_sample", roi_side_live, images)

    # 6: full loss fwd+bwd
    def full_loss(eps, imgs):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            ls = det.loss(v2, rng, {**tb, "images": imgs + eps}, anchors, nla)
            return sum(jnp.asarray(v).sum() for k, v in ls.items()
                       if k.startswith("loss"))
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    measure("full_loss", full_loss, images)

    print("FINAL " + json.dumps(
        {k: round(v * 1000, 2) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
