"""Grid R-CNN (reference ``detectors/grid_rcnn.py`` +
``mask_heads/grid_head.py``): target geometry, voting decode round-trip,
and the full detector train/test path."""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.models.roi_heads.grid_head import (
    GridCfg,
    grid_refine_boxes,
    grid_targets,
    sub_regions,
)


def test_sub_regions_match_reference_formula():
    """Grid-R-CNN-Plus sub-region crops (``calc_sub_regions:196``): corner
    points pin to the corners of the 56-map, the centre point is centred."""
    regs = sub_regions(9, 56)
    assert regs[0] == (0, 0, 28, 28)  # (x_idx 0, y_idx 0)
    assert regs[8] == (28, 28, 56, 56)  # (2, 2)
    # centre point (1, 1): ratio 1/2 - 0.25 = 0.25 -> 14
    assert regs[4] == (14, 14, 42, 42)


def test_grid_targets_mark_gt_grid_points():
    """A proposal equal to its GT: every grid point of the GT lands inside
    the 2x window at the known location, marked with a radius-1 circle."""
    cfg = GridCfg()
    box = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])
    tgt, w = grid_targets(cfg, box, box, jnp.asarray([True]))
    assert tgt.shape == (1, 28, 28, 9)
    assert w[0] == 1.0
    t = np.asarray(tgt)[0]
    # point 0 = gt corner (x1, y1): whole-map coord = ((16-0)/64)*56 = 14;
    # sub-region 0 starts at (0, 0) so crop coord is (14, 14)
    assert t[14, 14, 0] == 1.0
    # each point's circle has 1 + 4 neighbours marked (radius 1)
    assert t[..., 0].sum() == 5.0
    # tiny box (expanded 2x width <= grid_size, reference get_targets:262)
    small = jnp.asarray([[10.0, 10.0, 11.4, 11.4]])
    _, w2 = grid_targets(cfg, small, small, jnp.asarray([True]))
    assert w2[0] == 0.0


def test_grid_voting_decode_recovers_box():
    """Heatmaps with all mass at the GT grid-point positions must vote the
    GT box back (inverse of the target transform)."""
    cfg = GridCfg()
    det = jnp.asarray([[16.0, 16.0, 48.0, 48.0]])
    gt = jnp.asarray([[20.0, 18.0, 44.0, 46.0]])
    # radius-0 targets give a unique peak per point (argmax is exact)
    tgt, _ = grid_targets(
        GridCfg(pos_radius=0), det, gt, jnp.asarray([True])
    )
    heat = jnp.where(tgt > 0, 10.0, -10.0)
    out = np.asarray(
        grid_refine_boxes(cfg, det, heat, jnp.asarray([100.0, 100.0]))
    )[0]
    # half-resolution heatmap quantises to whole-map pixels (64/56 px here)
    np.testing.assert_allclose(out, np.asarray(gt)[0], atol=1.2)


@pytest.mark.slow
def test_grid_rcnn_detector_train_and_test():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(
            REPO, "configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py"
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    mc["roi_head"]["bbox_head"].update(fc_out_channels=16, num_classes=4)
    mc["roi_head"]["grid_head"].update(point_feat_channels=8)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=8)
    mc["test_cfg"]["rcnn"]["max_per_img"] = 8
    det = build_detector(mc)
    assert det.net.bbox_head.with_reg is False

    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_grid" in losses
    assert float(losses["loss_bbox"]) == 0.0  # with_reg=False
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(p):
        vs = {**variables, "params": p}
        ls = det.loss(vs, jax.random.PRNGKey(1), batch, anchors, nla)
        return ls["loss_grid"] + ls["loss_cls"]

    g = jax.grad(total)(variables["params"])
    gn = sum(jnp.sum(jnp.abs(l)) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(float(gn)) and float(gn) > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    d = np.asarray(dets)
    assert d.shape[-1] == 5
    assert np.isfinite(d[np.asarray(valid)]).all()
