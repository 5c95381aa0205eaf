"""Seesaw (stateful cumulative counts) + GHM retina wiring (round-3
config-breadth work; reference configs/seesaw_loss + configs/ghm).

Covers:
  * ``SeesawLoss`` config -> ConvFCBBoxHead holds ``seesaw_counts`` in
    batch_stats; the train step accumulates them across steps (reference
    ``SeesawLoss.cum_samples`` buffer) and the loss stays finite;
  * a direct ``detector.loss`` call on the seesaw model stays pure
    (no state mutation) and finite;
  * ``GHMC``/``GHMR`` config -> retina loss routes through
    ``ghm_c_loss``/``ghm_r_loss``;
  * momentum>0 (reference EMA ``acc_sum`` buffers,
    ``mmdet/models/losses/ghm_loss.py:104-106``) matches a hand-rolled
    numpy replay of the reference bin loop over several steps, and the
    buffers thread through the train step via ``batch_stats``.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.data.loader import FakeDetLoader

CANVAS = (64, 96)


def _seesaw_model_cfg():
    return dict(
        type="FasterRCNN",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=32,
                  num_outs=5),
        rpn_head=dict(
            type="RPNHead", in_channels=32, feat_channels=32,
            anchor_generator=dict(
                scales=[8], ratios=[1.0], strides=[4, 8, 16, 32, 64]),
        ),
        roi_head=dict(
            type="StandardRoIHead",
            bbox_roi_extractor=dict(
                roi_layer=dict(type="RoIAlign", output_size=7),
                out_channels=32, featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(
                type="Shared2FCBBoxHead", num_classes=4, in_channels=32,
                fc_out_channels=32,
                loss_cls=dict(type="SeesawLoss", p=0.8, q=2.0,
                              num_classes=4, loss_weight=1.0),
            ),
        ),
        train_cfg=dict(
            rcnn=dict(sampler=dict(type="RandomSampler", num=16,
                                   pos_fraction=0.25)),
            rpn_proposal=dict(nms_pre=64, max_per_img=32,
                              nms=dict(iou_threshold=0.7)),
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=48, max_per_img=16,
                     nms=dict(iou_threshold=0.7)),
            rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=8),
        ),
    )


def _batch():
    b = next(FakeDetLoader(2, CANVAS, 4, num_batches=1).epoch_iter(0))
    b.pop("ori_shape")
    return {k: jnp.asarray(v) for k, v in b.items()}


@pytest.mark.slow
def test_seesaw_counts_accumulate_through_train_step():
    import optax

    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )

    det = build_detector(_seesaw_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    assert "seesaw_counts" in variables["batch_stats"]["bbox_head"], (
        "seesaw head must declare its count buffer at init")
    anchors, nla = det.anchors_for(CANVAS)
    state = create_train_state(variables, optax.sgd(1e-3))
    step = make_train_step(det, anchors, nla)
    batch = _batch()
    c0 = np.asarray(state.batch_stats["bbox_head"]["seesaw_counts"])
    assert c0.sum() == 0.0
    state, m = step(state, batch, jax.random.PRNGKey(1))
    c1 = np.asarray(state.batch_stats["bbox_head"]["seesaw_counts"])
    state, m = step(state, batch, jax.random.PRNGKey(2))
    c2 = np.asarray(state.batch_stats["bbox_head"]["seesaw_counts"])
    # counts grow monotonically with sampled rois (32 valid slots in this
    # tiny cfg -> +32 per step)
    assert c1.sum() > 0 and c2.sum() > c1.sum()
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_seesaw_direct_loss_is_pure_and_finite():
    det = build_detector(_seesaw_model_cfg())
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    losses = det.loss(variables, jax.random.PRNGKey(1), _batch(),
                      anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    # the init tree's buffer is untouched (purity of a direct call)
    assert float(np.asarray(
        variables["batch_stats"]["bbox_head"]["seesaw_counts"]).sum()) == 0.0


def _ghm_retina_cfg(momentum=0.0, momentum_r=0.0):
    return dict(
        type="RetinaNet",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=32,
                  start_level=1, add_extra_convs="on_input", num_outs=5),
        bbox_head=dict(
            type="RetinaHead", num_classes=4, in_channels=32,
            feat_channels=32, stacked_convs=1,
            anchor_generator=dict(
                octave_base_scale=4, scales_per_octave=1, ratios=[1.0],
                strides=[8, 16, 32, 64, 128]),
            loss_cls=dict(type="GHMC", bins=8, momentum=momentum,
                          use_sigmoid=True, loss_weight=1.0),
            loss_bbox=dict(type="GHMR", mu=0.02, bins=4,
                           momentum=momentum_r, loss_weight=10.0),
        ),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=8),
    )


@pytest.mark.slow
def test_ghm_retina_loss_and_grads():
    det = build_detector(_ghm_retina_cfg())
    assert det.head_cfg.loss_cls_type == "ghm"
    assert det.head_cfg.loss_bbox_type == "ghmr"
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = _batch()

    def total(params):
        losses = det.loss({"params": params["params"],
                           "batch_stats": variables.get("batch_stats", {})},
                          jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(v) for v in losses.values())

    val, grads = jax.value_and_grad(total)(
        {"params": variables["params"]})
    assert np.isfinite(float(val))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).sum()) > 0 for g in flat)


def _oracle_ghm_weights(g, valid, bins, mmt, acc):
    """Numpy replay of the reference bin loop
    (``mmdet/models/losses/ghm_loss.py:94-112``): EMA acc_sum update for
    non-empty bins, post-update denominator, /n non-empty bins."""
    edges = np.arange(bins + 1, dtype=np.float64) / bins
    edges[-1] += 1e-6
    tot = max(float(valid.sum()), 1.0)
    w = np.zeros_like(g, dtype=np.float64)
    acc = acc.astype(np.float64).copy()
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        nib = float(inds.sum())
        if nib > 0:
            if mmt > 0:
                acc[i] = mmt * acc[i] + (1 - mmt) * nib
                w[inds] = tot / acc[i]
            else:
                w[inds] = tot / nib
            n += 1
    if n > 0:
        w = w / n
    return w, tot, acc


def test_ghm_c_momentum_matches_oracle():
    """Multi-step EMA replay: jax ghm_c_loss(acc_sum=...) == numpy oracle."""
    from boosting_rcnn_tpu.ops import losses as L

    rs = np.random.RandomState(0)
    bins, mmt = 8, 0.75
    acc_jax = jnp.zeros((bins,), jnp.float32)
    acc_np = np.zeros((bins,))
    for step in range(4):
        pred = rs.randn(64, 3).astype(np.float32)
        target = (rs.rand(64, 3) > 0.7).astype(np.float32)
        lw = (rs.rand(64, 3) > 0.2).astype(np.float32)
        loss, acc_jax = L.ghm_c_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw),
            bins=bins, momentum=mmt, acc_sum=acc_jax,
        )
        g = np.abs(1.0 / (1.0 + np.exp(-pred.astype(np.float64))) - target)
        w, tot, acc_np = _oracle_ghm_weights(g, lw > 0, bins, mmt, acc_np)
        p64 = pred.astype(np.float64)
        bce = (np.maximum(p64, 0) - p64 * target
               + np.log1p(np.exp(-np.abs(p64))))
        np.testing.assert_allclose(
            np.asarray(acc_jax), acc_np, rtol=1e-5,
            err_msg=f"acc_sum diverged at step {step}")
        np.testing.assert_allclose(
            float(loss), float((bce * w).sum() / tot), rtol=1e-4,
            err_msg=f"loss diverged at step {step}")


def test_ghm_r_momentum_matches_oracle():
    from boosting_rcnn_tpu.ops import losses as L

    rs = np.random.RandomState(1)
    bins, mmt, mu = 4, 0.7, 0.02
    acc_jax = jnp.zeros((bins,), jnp.float32)
    acc_np = np.zeros((bins,))
    for step in range(4):
        pred = rs.randn(48, 4).astype(np.float32)
        target = rs.randn(48, 4).astype(np.float32)
        lw = (rs.rand(48, 4) > 0.5).astype(np.float32)
        loss, acc_jax = L.ghm_r_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw),
            mu=mu, bins=bins, momentum=mmt, acc_sum=acc_jax,
        )
        d = pred.astype(np.float64) - target
        asl1 = np.sqrt(d * d + mu * mu) - mu
        g = np.abs(d / np.sqrt(d * d + mu * mu))
        w, tot, acc_np = _oracle_ghm_weights(g, lw > 0, bins, mmt, acc_np)
        np.testing.assert_allclose(
            np.asarray(acc_jax), acc_np, rtol=1e-5,
            err_msg=f"acc_sum diverged at step {step}")
        np.testing.assert_allclose(
            float(loss), float((asl1 * w).sum() / tot), rtol=1e-4,
            err_msg=f"loss diverged at step {step}")


def test_ghm_stateless_matches_oracle():
    """momentum=0 (no state) still matches the reference loop."""
    from boosting_rcnn_tpu.ops import losses as L

    rs = np.random.RandomState(2)
    bins = 8
    pred = rs.randn(64, 3).astype(np.float32)
    target = (rs.rand(64, 3) > 0.7).astype(np.float32)
    lw = (rs.rand(64, 3) > 0.2).astype(np.float32)
    loss = L.ghm_c_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw), bins=bins)
    g = np.abs(1.0 / (1.0 + np.exp(-pred.astype(np.float64))) - target)
    w, tot, _ = _oracle_ghm_weights(g, lw > 0, bins, 0.0, np.zeros(bins))
    p64 = pred.astype(np.float64)
    bce = (np.maximum(p64, 0) - p64 * target
           + np.log1p(np.exp(-np.abs(p64))))
    np.testing.assert_allclose(
        float(loss), float((bce * w).sum() / tot), rtol=1e-4)


def test_ghm_momentum_state_threads_through_train_step():
    """Reference config hyperparameters (momentum 0.75/0.7,
    configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:8,16): the acc_sum
    buffers are declared at init and advance every train step."""
    import optax

    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_train_step,
    )

    det = build_detector(_ghm_retina_cfg(momentum=0.75, momentum_r=0.7))
    assert det.head_cfg.ghm_momentum == 0.75
    assert det.head_cfg.ghmr_momentum == 0.7
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    hs = variables["batch_stats"]["head"]
    assert hs["ghm_acc_sum_c"].shape == (8,)
    assert hs["ghm_acc_sum_r"].shape == (4,)
    anchors, nla = det.anchors_for(CANVAS)
    state = create_train_state(variables, optax.sgd(1e-3))
    step = make_train_step(det, anchors, nla)
    batch = _batch()
    state, m = step(state, batch, jax.random.PRNGKey(1))
    c1 = np.asarray(state.batch_stats["head"]["ghm_acc_sum_c"])
    r1 = np.asarray(state.batch_stats["head"]["ghm_acc_sum_r"])
    assert c1.sum() > 0 and r1.sum() > 0, "EMA buffers must update"
    state, m = step(state, batch, jax.random.PRNGKey(2))
    c2 = np.asarray(state.batch_stats["head"]["ghm_acc_sum_c"])
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(c1, c2), "EMA must keep moving across steps"
    # direct loss call stays pure: init tree untouched
    losses = det.loss(variables, jax.random.PRNGKey(3), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(np.asarray(
        variables["batch_stats"]["head"]["ghm_acc_sum_c"]).sum()) == 0.0
