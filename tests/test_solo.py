"""SOLO (reference ``detectors/solo.py`` + ``solo_head.py``) and matrix NMS
golden tests."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.ops.matrix_nms import mask_matrix_nms


def test_matrix_nms_golden():
    """Two identical same-class masks: the second's score decays by
    exp(-sigma) (gaussian, IoU 1); a disjoint mask is untouched."""
    m1 = np.zeros((8, 8), np.float32)
    m1[:4, :4] = 1
    m3 = np.zeros((8, 8), np.float32)
    m3[5:, 5:] = 1
    masks = jnp.asarray(np.stack([m1, m1, m3]))
    labels = jnp.asarray([0, 0, 0])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.ones(3, bool)
    sc, lab, mm, v, order = mask_matrix_nms(
        masks, labels, scores, valid, kernel="gaussian", sigma=2.0
    )
    sc = np.asarray(sc)
    np.testing.assert_allclose(sc[0], 0.9, atol=1e-6)  # top survives
    # duplicate decayed: 0.8 * exp(-2 * 1^2)
    dup = 0.8 * np.exp(-2.0)
    # disjoint untouched: 0.7 -> outranks the decayed duplicate
    np.testing.assert_allclose(sorted(sc[1:], reverse=True), [0.7, dup],
                               atol=1e-5)
    # different class never suppresses
    sc2, *_ = mask_matrix_nms(
        masks, jnp.asarray([0, 1, 0]), scores, valid
    )
    np.testing.assert_allclose(np.asarray(sc2)[:3], [0.9, 0.8, 0.7],
                               atol=1e-6)


def test_solo_targets_center_region():
    """A gt covering the image center must activate the center grid cells
    of its scale-matched level only, with the gt's label."""
    from boosting_rcnn_tpu.models.dense_heads.solo_head import (
        SOLOCfg,
        solo_targets_level,
    )

    cfg = SOLOCfg(
        num_classes=4, num_grids=(8, 6), strides=(8, 8),
        scale_ranges=((1, 64), (32, 512)), max_pos=8,
    )
    canvas = (128.0, 128.0)
    # one 40x40 gt centered at (64, 64): sqrt area 40 -> matches both ranges
    gtb = jnp.asarray([[44.0, 44.0, 84.0, 84.0]])
    gtl = jnp.asarray([2])
    gtm = jnp.asarray([True])
    crop = jnp.ones((1, 28, 28), jnp.float32)
    labels, cell_gt, pos, gt_feat = solo_targets_level(
        cfg, 0, gtb, gtl, gtm, crop, (32, 32), canvas
    )
    lab = np.asarray(labels)
    # center cell (4, 4) of the 8-grid must carry label 2
    assert lab[4, 4] == 2 or lab[3, 3] == 2
    assert (lab[np.asarray(pos).reshape(8, 8)] == 2).all()
    assert np.asarray(pos).sum() >= 1
    # rasterised gt mask covers ~ (40/128*32)^2 = 100 feat pixels
    area = float(np.asarray(gt_feat)[0].sum())
    assert 60 < area < 160
    # far-away cells stay background
    assert lab[0, 0] == cfg.num_classes


@pytest.mark.slow
def test_solo_forward_train_and_predict():
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(os.path.join(REPO, "configs/solo/solo_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["mask_head"].update(
        num_classes=4, feat_channels=32, stacked_convs=1,
        num_grids=[8, 6, 6, 4, 4],
        scale_ranges=((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)),
    )
    mc["test_cfg"].update(score_thr=0.0, max_per_img=10)
    det = build_detector(mc)

    canvas = (64, 64)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    pack, nlp = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1, with_masks=True)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert set(losses) == {"loss_cls", "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_mask"]) > 0

    # gradients flow to both towers
    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, pack, nlp)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gs = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gs) and gs > 0

    dets, labels, valid, masks = det.predict(variables, batch, pack, nlp)
    dets = np.asarray(dets)
    assert dets.shape[-1] == 5
    # native full-image masks at 1/4 canvas (reference get_results emits
    # image-resolution masks — not box crops)
    masks = np.asarray(masks)
    assert masks.shape[-2:] == (canvas[0] // 4, canvas[1] // 4)
    assert det.full_image_masks and det.mask_stride == 4
    assert np.isfinite(dets[np.asarray(valid)]).all()


def test_full_image_masks_eval_beyond_bbox():
    """VERDICT r2 item 3 acceptance: a det whose mask extends beyond its
    fitted bbox still scores segm AP 1.0 when masks are full-image rasters
    (the old box-crop path clipped the mask to the box and could not)."""
    from boosting_rcnn_tpu.core.evaluation.coco_eval import SegmCocoStyleEval

    h = w = 64
    # gt mask: 40x40 square at (8, 8); gt bbox deliberately smaller
    seg = [[8.0, 8.0, 48.0, 8.0, 48.0, 48.0, 8.0, 48.0]]
    gt = dict(
        bboxes=np.asarray([[16.0, 16.0, 40.0, 40.0]], np.float32),
        labels=np.asarray([0], np.int64),
        bboxes_ignore=np.zeros((0, 4), np.float32),
        height=h,
        width=w,
        segmentations=[seg],
        areas=np.asarray([1600.0], np.float64),
    )
    det_mask = np.zeros((h, w), np.uint8)
    det_mask[8:48, 8:48] = 1  # matches the gt mask, exceeds the det box
    dets = np.asarray([[16.0, 16.0, 40.0, 40.0, 0.9]], np.float32)
    results = [(dets, np.asarray([0], np.int64), [det_mask])]
    s = SegmCocoStyleEval([gt], results, num_classes=1).summarize()
    assert s["AP"] == pytest.approx(1.0), s


def test_full_masks_to_bitmaps_round_trip():
    """Adapter: 1/4-canvas raster -> original-image bitmap respects the
    resize->crop->resize chain."""
    from boosting_rcnn_tpu.data.mask_utils import full_masks_to_bitmaps

    # canvas 64x96, valid region 50x75, original image 100x150
    m = np.zeros((16, 24), np.float32)
    m[2:8, 3:12] = 1.0  # canvas-coords box (12,8)-(48,32)
    bm = full_masks_to_bitmaps(
        m[None], img_shape=(50, 75), ori_shape=(100, 150), stride=4
    )[0]
    assert bm.shape == (100, 150)
    # canvas box (12,8)-(48,32) scaled 2x -> roughly (24,16)-(96,64)
    ys, xs = np.where(bm)
    assert 12 <= ys.min() <= 20 and 58 <= ys.max() <= 68
    assert 20 <= xs.min() <= 28 and 90 <= xs.max() <= 100
