"""Seesaw (stateful cumulative counts) + GHM retina wiring (round-3
config-breadth work; reference configs/seesaw_loss + configs/ghm).

Covers:
  * ``SeesawLoss`` config -> ConvFCBBoxHead holds ``seesaw_counts`` in
    batch_stats; the train step accumulates them across steps (reference
    ``SeesawLoss.cum_samples`` buffer) and the loss stays finite;
  * a direct ``detector.loss`` call on the seesaw model stays pure
    (no state mutation) and finite;
  * ``GHMC``/``GHMR`` config -> retina loss routes through
    ``ghm_c_loss``/``ghm_r_loss``; momentum>0 raises (repo convention).
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


def _ghm_retina_cfg(momentum=0.0):
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
            loss_bbox=dict(type="GHMR", mu=0.02, bins=4, loss_weight=10.0),
        ),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=8),
    )


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


def test_ghm_momentum_raises():
    with pytest.raises(NotImplementedError):
        build_detector(_ghm_retina_cfg(momentum=0.75))
