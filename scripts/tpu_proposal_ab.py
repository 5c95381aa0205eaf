"""A/B: proposal generation from flat (flatten_levels -> slice) vs
per-level head outputs, traced on the TPU at train geometry.

Round-4 trace attributed ~5 ms/step to the proposal path: a [8,151200]
kv-sort (level-0 top-k), a (8,151200,4) layout copy (the flat reg array
feeds the loss in one layout and the proposal gather in another), a
compaction fusion and the NMS while chain.  Hypothesis: gathering from
the per-level (B, H, W, A*4) arrays before any concat removes the
layout-conflicted flat materialization.

Usage: python scripts/tpu_proposal_ab.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import glob
import gzip
import json
import collections

import jax
import jax.numpy as jnp
import numpy as np

B = 8
NA = 9  # 3 scales x 3 ratios
SIZES = [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]
NMS_PRE, MAX_PER_IMG, IOU_THR = 4000, 2000, 0.7


def make_inputs():
    rs = np.random.RandomState(0)
    cls_l = [jnp.asarray(rs.randn(B, h, w, NA), jnp.bfloat16)
             for h, w in SIZES]
    reg_l = [jnp.asarray(rs.randn(B, h, w, NA * 4) * 0.1, jnp.bfloat16)
             for h, w in SIZES]
    iou_l = [jnp.asarray(rs.randn(B, h, w, NA), jnp.bfloat16)
             for h, w in SIZES]
    nla = [h * w * NA for h, w in SIZES]
    total = sum(nla)
    cx = rs.uniform(0, 1344, (total,)); cy = rs.uniform(0, 800, (total,))
    s = rs.uniform(16, 256, (total,))
    anchors = jnp.asarray(
        np.stack([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2], -1),
        jnp.float32)
    img_shapes = jnp.asarray([[800.0, 1333.0]] * B, jnp.float32)
    return cls_l, reg_l, iou_l, anchors, nla, img_shapes


def flat_variant(cls_l, reg_l, iou_l, anchors, nla, img_shapes):
    from boosting_rcnn_tpu.models.detectors.two_stage import flatten_levels
    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        ATSSRPNCfg, atss_rpn_proposals)

    cfg = ATSSRPNCfg()
    cls = flatten_levels(cls_l, 1)[..., 0]
    reg = flatten_levels(reg_l, 4)
    iou = flatten_levels(iou_l, 1)[..., 0]
    fn = lambda c, r, i, s: atss_rpn_proposals(
        cfg, c, r, i, anchors, nla, s, nms_pre=NMS_PRE,
        max_per_img=MAX_PER_IMG, nms_iou_thr=IOU_THR)
    return jax.vmap(fn)(cls, reg, iou, img_shapes)


def perlevel_variant(cls_l, reg_l, iou_l, anchors, nla, img_shapes):
    from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
        ATSSRPNCfg, _decode)
    from boosting_rcnn_tpu.ops.nms import batched_nms_padded

    cfg = ATSSRPNCfg()
    parts_s, parts_d, parts_a, parts_i = [], [], [], []
    start = 0
    for lvl, ((h, w), na) in enumerate(zip(SIZES, nla)):
        c = cls_l[lvl].reshape(B, na)
        i = iou_l[lvl].reshape(B, na)
        fused = jnp.sqrt(
            jax.nn.sigmoid(c.astype(jnp.float32))
            * jax.nn.sigmoid(i.astype(jnp.float32)))
        k = min(NMS_PRE, na)
        ts, ti = jax.lax.top_k(fused, k)  # (B, k)
        rl = reg_l[lvl].reshape(B, na, 4)
        parts_d.append(jnp.take_along_axis(
            rl, ti[..., None].astype(jnp.int32), axis=1))
        parts_a.append(anchors[start:start + na][ti])
        parts_s.append(ts)
        parts_i.append(jnp.full((k,), lvl, jnp.int32))
        start += na
    scores = jnp.concatenate(parts_s, axis=1)
    deltas = jnp.concatenate(parts_d, axis=1)
    ancs = jnp.concatenate(parts_a, axis=1)
    ids = jnp.concatenate(parts_i)

    def per_img(sc, dl, an, shp):
        props = _decode(cfg, an, dl, max_shape=shp)
        ww = props[:, 2] - props[:, 0]
        hh = props[:, 3] - props[:, 1]
        ok = (ww > 0.0) & (hh > 0.0)
        b, s_, v, _ = batched_nms_padded(
            props, sc, ids, IOU_THR, MAX_PER_IMG, valid=ok)
        return b, jnp.where(v, s_, 0.0), v

    return jax.vmap(per_img)(scores, deltas, ancs, img_shapes)


def trace_one(name, fn, args):
    cls_l, reg_l, iou_l, anchors, nla, img_shapes = args
    jitted = jax.jit(lambda c, r, i, a, s: fn(c, r, i, a, nla, s))
    args = (cls_l, reg_l, iou_l, anchors, img_shapes)
    out = jitted(*args)
    jax.block_until_ready(out)
    outdir = f"/tmp/jax_trace_prop_{name}"
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = jitted(*args)
        jax.block_until_ready(out)
    p = sorted(glob.glob(outdir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(p) as f:
        d = json.load(f)
    dev = [e["pid"] for e in d["traceEvents"]
           if e.get("ph") == "M" and e.get("name") == "process_name"
           and "TPU" in e["args"]["name"]][0]
    agg = collections.defaultdict(float)
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") == dev and "dur" in e:
            if e["name"].startswith("jit_") or e["name"].isdigit():
                continue
            agg[e["name"]] += e["dur"]
    tot = sum(agg.values()) / 3e3
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:8]
    print(f"{name}: {tot:.2f} ms/call device self-time")
    for k, v in top:
        print(f"    {k:42s}{v/3e3:7.2f}")
    return out, tot


def main():
    args = make_inputs()
    out0, t0 = trace_one("flat", flat_variant, args)
    out1, t1 = trace_one("perlevel", perlevel_variant, args)
    # parity: same survivor boxes/scores (sort order inside NMS identical)
    b0, s0, v0 = out0
    b1, s1, v1 = out1
    n0, n1 = int(v0.sum()), int(v1.sum())
    print(f"valid: {n0} vs {n1}")
    err = float(jnp.max(jnp.abs(
        jnp.where(v0[..., None], b0, 0) - jnp.where(v1[..., None], b1, 0))))
    print(f"box maxabs diff: {err:.5f}")
    print(f"speedup: {t0:.2f} -> {t1:.2f} ms")


if __name__ == "__main__":
    main()
