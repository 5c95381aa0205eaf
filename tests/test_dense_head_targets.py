"""Dense-head target-assignment unit tests on hand-built geometry
(reference ``tests/test_models/test_dense_heads`` style)."""
import jax
import jax.numpy as jnp
import numpy as np

from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import (
    ATSSRPNCfg,
    atss_rpn_targets,
)
from boosting_rcnn_tpu.models.dense_heads.fcos_head import (
    FCOSCfg,
    fcos_points,
    fcos_targets,
)
from boosting_rcnn_tpu.ops.anchors import AnchorGenerator


def test_rpn_targets_positive_on_matching_anchor():
    ag = AnchorGenerator(strides=[8], ratios=[1.0], scales=[4.0])
    fs = [(8, 8)]
    anchors = jnp.asarray(ag.flat_anchors(fs))  # 64 anchors of 32x32
    gt = np.zeros((4, 4), np.float32)
    gt[0] = [16, 16, 48, 48]  # perfectly matches the anchor at cell (2..4)
    gm = np.array([True, False, False, False])
    cfg = ATSSRPNCfg()
    pos, lw, bt = atss_rpn_targets(
        cfg, anchors, jnp.ones(64, bool), jnp.asarray(gt), jnp.asarray(gm)
    )
    pos = np.asarray(pos)
    assert pos.sum() >= 1
    # the best-IoU anchor must be positive and its target box == the gt
    bt = np.asarray(bt)
    np.testing.assert_allclose(bt[pos][0], gt[0], atol=1e-5)
    # label weights cover pos + neg anchors
    assert np.asarray(lw).sum() == 64


def test_rpn_targets_respects_valid_mask():
    ag = AnchorGenerator(strides=[8], ratios=[1.0], scales=[4.0])
    anchors = jnp.asarray(ag.flat_anchors([(8, 8)]))
    gt = np.zeros((2, 4), np.float32)
    gt[0] = [16, 16, 48, 48]
    gm = np.array([True, False])
    valid = np.zeros(64, bool)  # everything invalid
    cfg = ATSSRPNCfg()
    pos, lw, bt = atss_rpn_targets(
        cfg, anchors, jnp.asarray(valid), jnp.asarray(gt), jnp.asarray(gm)
    )
    assert np.asarray(lw).sum() == 0  # no anchor contributes


def test_fcos_targets_level_routing():
    cfg = FCOSCfg(num_classes=4)
    fs = [(64, 64), (32, 32), (16, 16), (8, 8), (4, 4)]  # 512x512 canvas
    pts, strides, lo, hi = fcos_points(fs, cfg.strides)
    # a small gt (40px) must be assigned on the stride-8 level (range <64)
    gt = np.zeros((3, 4), np.float32)
    gt[0] = [40, 40, 80, 80]
    gm = np.array([True, False, False])
    gl = np.array([2, 0, 0], np.int32)
    labels, tgt, pos = fcos_targets(
        cfg, jnp.asarray(pts), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(strides), jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gm),
    )
    pos = np.asarray(pos)
    strides_np = np.asarray(strides)
    assert pos.sum() > 0
    assert set(strides_np[pos].tolist()) == {8.0}
    # a large gt (400px) must route to a coarse level (>= 64 range)
    gt[1] = [100, 100, 500, 500]
    gm = np.array([True, True, False])
    labels, tgt, pos2 = fcos_targets(
        cfg, jnp.asarray(pts), jnp.asarray(lo), jnp.asarray(hi),
        jnp.asarray(strides), jnp.asarray(gt), jnp.asarray(gl), jnp.asarray(gm),
    )
    pos2 = np.asarray(pos2)
    big_strides = set(strides_np[pos2 & ~pos].tolist())
    assert big_strides and min(big_strides) >= 32.0
    # labels carried through
    assert (np.asarray(labels)[pos] == 2).all()
