"""TPU train-step segment profiler (K-delta chained timing).

Relay block_until_ready under-reports and per-buffer sync over-reports, so
every segment is measured as a jitted ``lax.fori_loop`` chain of K
iterations with a data dependency threaded through a scalar; reported
time = (T(K_hi) - T(K_lo)) / (K_hi - K_lo), cancelling fixed dispatch
overhead.  Run with the TPU attached (NOT under JAX_PLATFORMS=cpu); keep
it the only TPU process.
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


def k_delta(make_chain, *args):
    """make_chain(K) -> jitted fn(*args) running the segment K times."""
    ts = {}
    for k in (K_LO, K_HI):
        fn = make_chain(k)
        r = fn(*args)
        jax.block_until_ready(r)  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(*args)
            jax.block_until_ready(r)
            reps.append(time.perf_counter() - t0)
        ts[k] = min(reps)
    return (ts[K_HI] - ts[K_LO]) / (K_HI - K_LO)


def chain_scalar(seg, K):
    """seg(x_perturb_scalar) -> scalar; chained K times."""

    @jax.jit
    def run(*args):
        def body(i, s):
            return s * 1e-30 + seg(s * 1e-30, *args)

        return jax.lax.fori_loop(0, K, body, 0.0)

    return run


def main():
    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    params = variables["params"]
    bstats = variables.get("batch_stats", {})

    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    rs = np.random.RandomState(0)
    images = chunked_device_put(
        rs.rand(BATCH, *CANVAS, 3).astype(np.float32))
    img_shape = jnp.asarray([[CANVAS[0], CANVAS[1] - 11]] * BATCH,
                            jnp.float32)

    va = {"params": params, **({"batch_stats": bstats} if bstats else {})}

    results = {}

    # ---- 1/2: backbone fwd and fwd+bwd ----
    def bb_fwd(eps, imgs):
        feats = det.net.apply(va, imgs + eps, method="features")
        return sum(f.astype(jnp.float32).sum() for f in feats) * 1e-12

    results["backbone_neck_fwd"] = k_delta(
        lambda K: chain_scalar(bb_fwd, K), images)

    def bb_fwdbwd(eps, imgs):
        def loss(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            feats = det.net.apply(v2, imgs + eps, method="features")
            return sum(f.astype(jnp.float32).sum() for f in feats)
        g = jax.grad(loss)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    results["backbone_neck_fwdbwd"] = k_delta(
        lambda K: chain_scalar(bb_fwdbwd, K), images)
    print(json.dumps(results), flush=True)

    # ---- 3: proposals (decode+topk+NMS) given fixed head outputs ----
    feats = det.net.apply(va, images, method="features")
    flat_cls, flat_reg, flat_iou = det._rpn_flat(va, feats)
    jax.block_until_ready(flat_cls)

    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        atss_rpn_proposals,
    )

    def props(eps, fc, fr, fi):
        def one(c, r, i2):
            b, s, v = atss_rpn_proposals(
                det.rpn_cfg, c + eps, r, i2, anchors, nla, img_shape[0],
                nms_pre=4000, max_per_img=2000, nms_iou_thr=0.7,
            )
            return b.astype(jnp.float32).sum() + s.astype(jnp.float32).sum()
        return jax.vmap(one)(fc, fr, fi).sum() * 1e-12

    results["proposals_train_cfg"] = k_delta(
        lambda K: chain_scalar(props, K), flat_cls, flat_reg, flat_iou)
    print(json.dumps(results), flush=True)

    # ---- 4: full train step ----
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        create_train_state, make_optimizer, make_train_step,
        step_lr_schedule,
    )

    tx = make_optimizer(step_lr_schedule(0.005, 1000), grad_clip_norm=35.0,
                        params=params, frozen_stages=1)
    state = create_train_state(variables, tx)
    loader = FakeDetLoader(batch_size=BATCH, canvas=CANVAS, num_classes=4,
                           num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}
    tstep = make_train_step(det, anchors, nla)

    def full_chain(K):
        @jax.jit
        def run(state, tb):
            def body(i, st):
                st2, m = tstep(st, tb, jax.random.PRNGKey(0))
                return st2
            out = jax.lax.fori_loop(0, K, body, state)
            # param-dependent output so XLA cannot DCE the chain
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(out.params)
            )
        return run

    results["full_train_step"] = k_delta(full_chain, state, tb)

    # ---- 5: rpn tower fwd+bwd on fixed features ----
    feats_fixed = jax.tree.map(jax.lax.stop_gradient, feats)

    def rpn_head_fwdbwd(eps, fts):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            fts2 = tuple(f + eps for f in fts)
            cls2, reg2, iou2 = det._rpn_flat(v2, fts2)
            out = cls2.astype(jnp.float32).sum() + reg2.astype(
                jnp.float32).sum()
            if iou2 is not None:
                out = out + iou2.astype(jnp.float32).sum()
            return out
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    results["rpn_head_fwdbwd"] = k_delta(
        lambda K: chain_scalar(rpn_head_fwdbwd, K), feats_fixed)

    # ---- 6: full loss fwd+bwd (no optimizer) ----
    def loss_fwdbwd(eps, imgs):
        def lf(p):
            v2 = {"params": p, **({"batch_stats": bstats} if bstats else {})}
            ls = det.loss(v2, jax.random.PRNGKey(0),
                          {**tb, "images": imgs + eps}, anchors, nla)
            return sum(jnp.asarray(v).sum() for k, v in ls.items()
                       if k.startswith("loss"))
        g = jax.grad(lf)(params)
        return sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree_util.tree_leaves(g)) * 1e-12

    results["loss_fwdbwd"] = k_delta(
        lambda K: chain_scalar(loss_fwdbwd, K), tb["images"])
    print("FINAL " + json.dumps(
        {k: round(v * 1000, 2) for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
