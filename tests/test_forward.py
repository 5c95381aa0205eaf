"""Model forward/loss smoke tests over the config zoo.

Mirrors the reference's test strategy (``tests/test_models/test_forward.py``:
real configs shrunk to tiny backbones, synthetic `_demo_mm_inputs` batches,
assert loss dict finite, then inference) — SURVEY.md §4.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.config import load_config
from boosting_rcnn_tpu.data.loader import FakeDetLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CANVAS = (128, 160)


def shrink(mc):
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"]["in_channels"] = [8, 16, 32, 64]
    mc["neck"]["out_channels"] = 32
    head_key = "rpn_head" if "rpn_head" in mc else "bbox_head"
    mc[head_key].update(feat_channels=32)
    if "stacked_convs" in mc[head_key]:
        mc[head_key]["stacked_convs"] = 2
    if "roi_head" in mc:
        bh = mc["roi_head"]["bbox_head"]
        heads = bh if isinstance(bh, list) else [bh]
        for h in heads:
            h["fc_out_channels"] = 32
        mc["train_cfg"]["rpn_proposal"].update(nms_pre=100, max_per_img=48)
        rcnn = mc["train_cfg"]["rcnn"]
        for rc in rcnn if isinstance(rcnn, list) else [rcnn]:
            rc["sampler"]["num"] = 24
        mc["test_cfg"]["rpn"].update(nms_pre=64, max_per_img=24)
    else:
        mc["test_cfg"]["nms_pre"] = 64
    return mc


def demo_batch(num_classes, b=2, g=5, seed=0):
    loader = FakeDetLoader(
        batch_size=b, canvas=CANVAS, num_classes=num_classes, max_gt=g,
        seed=seed, num_batches=1,
    )
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    return {k: jnp.asarray(v) for k, v in batch.items()}


CONFIGS = [
    "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py",
    "configs/faster_rcnn/faster_rcnn_r50_fpn_1x_coco.py",
    "configs/retinanet/retinanet_r50_fpn_1x_coco.py",
    "configs/atss/atss_r50_fpn_1x_coco.py",
    "configs/cascade_rcnn/cascade_rcnn_r50_fpn_1x_coco.py",
    "configs/boosting_rcnn/boosting_rcnn_r50_fpn_1x_coco.py",
    "configs/fcos/fcos_r50_fpn_1x_coco.py",
    "configs/gfl/gfl_r50_fpn_1x_coco.py",
]


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=[os.path.basename(c) for c in CONFIGS])
def test_forward_train_and_test(cfg_path):
    cfg = load_config(os.path.join(REPO, cfg_path))
    mc = shrink(cfg.model.to_dict())
    if "roi_head" in mc:
        bh = mc["roi_head"]["bbox_head"]
        num_classes = (bh[0] if isinstance(bh, list) else bh)["num_classes"]
    else:
        num_classes = mc["bbox_head"]["num_classes"]
        mc["bbox_head"]["num_classes"] = num_classes = min(num_classes, 8)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(num_classes)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert losses, "no losses returned"
    for k, v in losses.items():
        assert np.isfinite(float(v)), (cfg_path, k, float(v))
        assert float(v) >= 0, (cfg_path, k, float(v))
    # cls losses must be positive on random inputs
    cls_keys = [k for k in losses if "cls" in k]
    assert any(float(losses[k]) > 0 for k in cls_keys)

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    dets = np.asarray(dets)
    assert dets.ndim == 3 and dets.shape[-1] == 5
    assert np.isfinite(dets[np.asarray(valid)]).all()


@pytest.mark.parametrize("cfg_path", CONFIGS[:2], ids=[os.path.basename(c) for c in CONFIGS[:2]])
def test_forward_empty_gt(cfg_path):
    """Empty-GT edge case (reference ``test_forward.py:86-120``)."""
    cfg = load_config(os.path.join(REPO, cfg_path))
    mc = shrink(cfg.model.to_dict())
    num_classes = (
        mc["roi_head"]["bbox_head"]["num_classes"]
        if "roi_head" in mc
        else mc["bbox_head"]["num_classes"]
    )
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(num_classes)
    batch["gt_mask"] = jnp.zeros_like(batch["gt_mask"])
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (cfg_path, k, float(v))


def test_all_configs_load_and_build():
    """Config-zoo test: every config must load AND build a detector
    (reference ``test_config.py`` builds every config)."""
    for path in glob.glob(os.path.join(REPO, "configs/*/*.py")):
        if "_base_" in path:
            continue
        cfg = load_config(path)
        if "/common/" in path.replace(os.sep, "/"):
            # dataset/schedule-only recipes (reference configs/common) have
            # no model of their own — loading is the whole contract
            continue
        assert "model" in cfg.to_dict(), path
        det = build_detector(cfg.model.to_dict())
        assert det is not None, path


@pytest.mark.slow
def test_ssd_forward():
    """SSD300 end-to-end (multi-generator anchors; 8732-anchor canonical
    layout)."""
    cfg = load_config(os.path.join(REPO, "configs/ssd/ssd300_coco.py"))
    mc = cfg.model.to_dict()
    mc["bbox_head"]["num_classes"] = 4
    det = build_detector(mc)
    canvas = (300, 300)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    assert anchors.shape[0] == 8732  # canonical SSD300 anchor count
    loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_ssd512_forward():
    """SSD512 (reference configs/ssd/ssd512_coco.py): 7-level extras with
    last kernel 4; 24564-anchor canonical layout."""
    cfg = load_config(os.path.join(REPO, "configs/ssd/ssd512_coco.py"))
    mc = cfg.model.to_dict()
    mc["bbox_head"]["num_classes"] = 4
    det = build_detector(mc)
    canvas = (512, 512)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    assert anchors.shape[0] == 24564  # canonical SSD512 anchor count
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_yolov3_forward():
    mc = dict(
        type="YOLOV3",
        backbone=dict(type="Darknet", depth=53),
        bbox_head=dict(num_classes=4),
        test_cfg=dict(score_thr=0.05, nms=dict(iou_threshold=0.45),
                      max_per_img=100),
    )
    det = build_detector(mc)
    canvas = (128, 160)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    pack, nla = det.anchors_for(canvas)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, pack, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_detr_forward():
    mc = dict(
        type="DETR",
        backbone=dict(type="ResNet", depth=18, base_channels=8, out_indices=(3,)),
        bbox_head=dict(num_classes=4, num_query=20, embed_dims=32,
                       enc_layers=2, dec_layers=2),
        test_cfg=dict(max_per_img=20),
    )
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, None, batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch)
    assert np.isfinite(np.asarray(dets)).all()


def test_prob_cascade_forward():
    """ProbCascadeRoIHead (the ensemble-config path): boost cascade train +
    prior-fused stage-averaged inference."""
    cfg = load_config(
        os.path.join(REPO, "configs/ensemble/prob_cascade_rcnn_r50_pafpn_1x_utdac.py")
    )
    mc = shrink(cfg.model.to_dict())
    det = build_detector(mc)
    assert det.cascade_cfg.prob and det.cascade_cfg.boost
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert any(k.startswith("s2.") for k in losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_swin_mask_rcnn_forward():
    """Swin-T + Mask R-CNN (the BASELINE Swin config family), shrunk."""
    cfg = load_config(
        os.path.join(REPO, "configs/swin/mask_rcnn_swin_t_fpn_1x_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(embed_dims=8, depths=[1, 1, 1, 1],
                          num_heads=[1, 2, 4, 8])
    mc["neck"]["in_channels"] = [8, 16, 32, 64]
    mc["neck"]["out_channels"] = 32
    mc["rpn_head"]["feat_channels"] = 32
    mc["roi_head"]["bbox_head"].update(fc_out_channels=32, num_classes=4)
    mc["roi_head"]["mask_head"].update(num_classes=4, conv_out_channels=16)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=100, max_per_img=48)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 24
    mc["test_cfg"]["rpn"].update(nms_pre=64, max_per_img=24)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    loader = FakeDetLoader(batch_size=2, canvas=CANVAS, num_classes=4,
                           max_gt=5, num_batches=1, with_masks=True)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))


@pytest.mark.slow
def test_centernet_forward():
    """CenterNet: gaussian-heatmap loss + local-max NMS-free decode."""
    cfg = load_config(os.path.join(REPO, "configs/centernet/centernet_resnet18_140e_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(base_channels=8)
    mc["neck"]["num_deconv_filters"] = (16, 16, 16)
    mc["bbox_head"].update(num_classes=4, feat_channel=16)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    pack, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert set(losses) == {"loss_center_heatmap", "loss_wh", "loss_offset"}
    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert dets.shape[1:] == (100, 5)
    assert np.isfinite(np.asarray(dets)).all()


def test_centernet_targets_and_decode_roundtrip():
    """A perfect heatmap/wh/offset prediction decodes back to the gt box."""
    from boosting_rcnn_tpu.models.dense_heads.centernet_head import (
        CenterNetCfg,
        centernet_decode,
        centernet_targets,
    )

    cfg = CenterNetCfg(num_classes=3)
    h, w = 32, 40
    gt = jnp.asarray([[12.0, 8.0, 52.0, 36.0], [0, 0, 0, 0]])
    labels = jnp.asarray([2, 0])
    mask = jnp.asarray([True, False])
    heat, (ix, iy, bw, bh, ox, oy) = centernet_targets(cfg, (h, w), gt, labels, mask)
    assert heat.shape == (h, w, 3)
    # center pixel of the class channel is exactly 1, other channels empty
    assert float(heat[int(iy[0]), int(ix[0]), 2]) == 1.0
    assert float(heat[..., 0].max()) == 0.0 and float(heat[..., 1].max()) == 0.0
    # build a perfect prediction and decode
    logits = jnp.log(jnp.clip(heat, 1e-6, 1 - 1e-6) / (1 - jnp.clip(heat, 1e-6, 1 - 1e-6)))
    wh = jnp.zeros((h, w, 2)).at[int(iy[0]), int(ix[0])].set(jnp.asarray([bw[0], bh[0]]))
    off = jnp.zeros((h, w, 2)).at[int(iy[0]), int(ix[0])].set(jnp.asarray([ox[0], oy[0]]))
    dets, cls, valid = centernet_decode(
        cfg, logits, wh, off,
        img_shape=jnp.asarray([h * 4, w * 4]),
        scale_factor=jnp.ones(4), rescale=True, topk=5,
    )
    np.testing.assert_allclose(np.asarray(dets[0, :4]), np.asarray(gt[0]), atol=1e-3)
    assert int(cls[0]) == 2
    assert float(dets[0, 4]) > 0.9


@pytest.mark.slow
def test_sparse_rcnn_forward():
    """Sparse R-CNN: learnable proposals + 6 DII stages, Hungarian-matched
    losses per stage, NMS-free top-k decode."""
    cfg = load_config(os.path.join(REPO, "configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"]["in_channels"] = [8, 16, 32, 64]
    mc["neck"]["out_channels"] = 16
    mc["roi_head"].update(num_stages=2, proposal_feature_channel=16)
    mc["rpn_head"].update(num_proposals=20, proposal_feature_channel=16)
    for h in mc["roi_head"]["bbox_head"]:
        h.update(num_classes=4, in_channels=16, feedforward_channels=32)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS, batch_size=2)
    pack, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert len(losses) == 2 * 3  # 2 stages x (cls, bbox, iou)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert dets.shape == (2, 80, 5)  # k clamped to P*C
    assert np.isfinite(np.asarray(dets)).all()
    # losses must flow to the learned proposals
    grads = jax.grad(
        lambda v: sum(jax.tree_util.tree_leaves(
            det.loss(v, jax.random.PRNGKey(1), batch, pack, nlp)))
    )(variables)
    g = grads["params"]["init_proposal_features"]
    assert float(jnp.abs(g).max()) > 0


@pytest.mark.slow
def test_yolox_forward():
    """YOLOX: CSPDarknet + PAFPN + decoupled head, SimOTA-assigned losses."""
    cfg = load_config(os.path.join(REPO, "configs/yolox/yolox_s_8x8_300e_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(widen_factor=0.125, deepen_factor=0.33)
    mc["neck"].update(out_channels=32)
    mc["bbox_head"].update(num_classes=4, feat_channels=32)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    priors, nlp = det.anchors_for(CANVAS)
    assert priors.shape[0] == sum(nlp)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, priors, nlp)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_obj"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, priors, nlp)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_fovea_forward():
    """FoveaBox: scale-range level assignment + fovea-region positives."""
    cfg = load_config(os.path.join(REPO, "configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py"))
    mc = shrink(cfg.model.to_dict())
    mc["bbox_head"]["num_classes"] = 4
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    geom, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, geom, nlp)
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, geom, nlp)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_fovea_targets_geometry():
    """A gt stamps its fovea region on exactly the scale-matched level and
    the smallest gt wins overlaps."""
    from boosting_rcnn_tpu.models.dense_heads.fovea_head import (
        FoveaCfg,
        fovea_points,
        fovea_targets,
    )

    cfg = FoveaCfg(num_classes=3, strides=(8, 16), base_edge_list=(16, 32),
                   scale_ranges=((1, 64), (32, 2048)))
    fs = [(16, 20), (8, 10)]
    pack = [jnp.asarray(a) for a in fovea_points(
        fs, cfg.strides, cfg.base_edge_list, cfg.scale_ranges)]
    widths = jnp.concatenate([jnp.full(h * w, w) for h, w in fs]).astype(jnp.float32)
    heights = jnp.concatenate([jnp.full(h * w, h) for h, w in fs]).astype(jnp.float32)
    # big gt (sqrt area 96 -> level 1 only) and small one inside it
    # (sqrt area 32 -> both levels; wins overlap on level 1? no: level 0
    # range (1, 64) and level 1 (32, 2048) both contain 32)
    gts = jnp.asarray([[0.0, 0.0, 96.0, 96.0], [32.0, 32.0, 64.0, 64.0]])
    labels_in = jnp.asarray([1, 2])
    mask = jnp.asarray([True, True])
    labels, bbox_t, pos = fovea_targets(
        cfg, pack, widths, heights, gts, labels_in, mask)
    n0 = 16 * 20
    lab0 = np.asarray(labels[:n0]).reshape(16, 20)
    lab1 = np.asarray(labels[n0:]).reshape(8, 10)
    # level 0: only the small gt hits (sqrt 96 > 64); its center cell
    # (48/8=6) carries label 2
    assert lab0[6, 6] == 2
    assert not (lab0 == 1).any()
    # level 1: big gt fovea stamped; the small gt's sigma-shrunk fovea is
    # empty at stride 16 (ceil(2.1) > floor(2.9)) so the big gt keeps its
    # cells — same as the reference's empty-slice stamping
    assert lab1[3, 3] == 1
    assert (lab1 == 1).sum() > 0
    assert not (lab1 == 2).any()
    # box targets at a positive are finite log-ratios in [log(1/16), log 16]
    t = np.asarray(bbox_t)[np.asarray(pos)]
    assert np.isfinite(t).all() and (np.abs(t) <= np.log(16.0) + 1e-6).all()


def test_rpn_only_forward():
    """RPN-only detector: rpn losses only, proposals as detections."""
    cfg = load_config(os.path.join(REPO, "configs/rpn/rpn_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["rpn_head"].update(feat_channels=32)
    mc["test_cfg"]["rpn"].update(nms_pre=64, max_per_img=32)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert dets.shape[1:] == (32, 5)
    assert (np.asarray(labels) == 0).all()
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_libra_rcnn_forward():
    """Libra R-CNN: FPN + BFP (non-local refine) + balanced L1 bbox loss."""
    cfg = load_config(os.path.join(REPO, "configs/libra_rcnn/libra_faster_rcnn_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"][0].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["rpn_head"].update(feat_channels=32)
    mc["roi_head"]["bbox_head"].update(num_classes=4, fc_out_channels=32)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=100, max_per_img=48)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 24
    mc["test_cfg"]["rpn"].update(nms_pre=64, max_per_img=24)
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_vfnet_forward():
    """VFNet (reference vfnet_head.py): star-dconv refinement head —
    finite losses incl. both bbox stages, gradient flow through the star
    offsets, and decode."""
    cfg = load_config(os.path.join(REPO, "configs/vfnet/vfnet_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(feat_channels=32, stacked_convs=1, num_classes=4)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    pack, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_bbox_rf"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_cls"]) > 0

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, pack, nlp)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, pack, nlp)[:3]
    dets = np.asarray(dets)
    assert dets.shape[-1] == 5
    assert np.isfinite(dets[np.asarray(valid)]).all()


@pytest.mark.slow
def test_fsaf_forward_and_level_selection():
    """FSAF (reference fsaf_head.py): center-region targets + online level
    selection — finite losses, gradients, decode; a gt must be positive at
    exactly one level after selection."""
    cfg = load_config(os.path.join(REPO, "configs/fsaf/fsaf_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(feat_channels=32, stacked_convs=1, num_classes=4)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)[:3]
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_center_region_assigner_golden():
    """CenterRegionAssigner (reference center_region_assigner.py): centers
    in the 0.2-shrunk box are positive, in the 0.5-shrunk ring ignored,
    outside negative; overlapping gts resolve to the smaller one."""
    from boosting_rcnn_tpu.ops.assigners import center_region_assign

    # stride-4 square anchors centered at (2+4i, 2)
    xs = np.arange(0, 80, 4, np.float32)
    anchors = np.stack([xs, np.zeros_like(xs), xs + 4, np.full_like(xs, 4)],
                       -1)
    gts = jnp.asarray([[0.0, 0.0, 40.0, 4.0], [10.0, 0.0, 30.0, 4.0]])
    gmask = jnp.asarray([True, True])
    glabels = jnp.asarray([1, 2])
    res = center_region_assign(
        jnp.asarray(anchors), jnp.ones(len(xs), bool), gts, gmask, glabels,
        pos_scale=0.2, ignore_scale=0.5,
    )
    gi = np.asarray(res.gt_inds)
    # gt1 (smaller, area 80) center region x in [18, 22]: anchor center 18
    # => assigned to gt 2 (index 1 -> gt_inds 2) with label 2
    c = (anchors[:, 0] + anchors[:, 2]) / 2
    pos1 = (c >= 16) & (c <= 24)
    assert (gi[pos1 & (gi > 0)] == 2).all()
    # gt0 center region x in [16, 24] — overlap resolved to smaller gt1;
    # far outside both ignore regions => negative
    assert (gi[c > 45] == 0).all()
    # inside gt0's 0.5 region ([10, 30]) but outside its pos region and
    # outside gt1's regions => ignored (-1)
    ring = (c >= 11) & (c <= 14)
    assert (gi[ring] == -1).all()


@pytest.mark.slow
def test_paa_forward_and_gmm():
    """PAA (reference paa_head.py): GMM reassignment + score voting —
    finite losses/grads/decode; the EM helper separates bimodal data."""
    from boosting_rcnn_tpu.models.dense_heads.paa_head import gmm_em_1d

    x = jnp.asarray([0.1, 0.12, 0.08, 2.0, 2.1, 1.9])
    v = jnp.ones(6, bool)
    resp0, loglik, means = gmm_em_1d(x, v, 10)
    r = np.asarray(resp0)
    assert r[:3].all() and not r[3:].any()  # low-loss cluster separated

    cfg = load_config(os.path.join(REPO, "configs/paa/paa_r50_fpn_1x_coco.py"))
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(feat_channels=32, stacked_convs=1, num_classes=4)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_iou"}
    for k, v_ in losses.items():
        assert np.isfinite(float(v_)), (k, float(v_))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x_) for x_ in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x_).sum()) for x_ in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_yolof_forward():
    """YOLOF (reference yolof_head.py): single-level dilated encoder +
    implicit objectness + uniform matching — losses/grads/decode."""
    cfg = load_config(
        os.path.join(REPO, "configs/yolof/yolof_r50_c5_8x8_1x_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(out_channels=32, block_mid_channels=8)
    mc["bbox_head"].update(num_classes=4)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    assert variables.get("batch_stats"), "YOLOF carries live BN"
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_uniform_assigner_golden():
    """UniformAssigner (reference uniform_assigner.py): each gt takes its
    match_times closest anchors + closest predictions; low-anchor-IoU
    positives are ignored; high-pred-IoU negatives are ignored."""
    from boosting_rcnn_tpu.ops.assigners import uniform_assign

    anchors = jnp.asarray(
        [[0.0, 0, 10, 10], [20, 0, 30, 10], [100, 100, 110, 110],
         [0, 0, 64, 64]]
    )
    preds = jnp.asarray(
        [[1.0, 1, 11, 11], [21, 0, 31, 10], [100, 100, 110, 110],
         [0, 0, 60, 60]]
    )
    gts = jnp.asarray([[0.0, 0, 12, 12]])
    res = uniform_assign(
        preds, anchors, jnp.ones(4, bool), gts, jnp.asarray([True]),
        jnp.asarray([3]), match_times=1, pos_ignore_thr=0.15,
        neg_ignore_thr=0.7,
    )
    gi = np.asarray(res.gt_inds)
    # anchor 0 is both the closest anchor and closest pred with IoU > 0.15
    assert gi[0] == 1 and np.asarray(res.labels)[0] == 3
    # anchor 2 is far: plain negative
    assert gi[2] == 0


@pytest.mark.slow
def test_reppoints_forward():
    """RepPoints (reference reppoints_head.py): two-stage point sets with
    moment transform — losses/grads/decode; moment transform golden."""
    from boosting_rcnn_tpu.models.dense_heads.reppoints_head import (
        points2bbox,
    )

    # golden: 9 points on a known box; zero moment transfer -> std box
    pts = np.stack(
        np.meshgrid(np.asarray([10.0, 20, 30]), np.asarray([40.0, 50, 60])),
        -1,
    ).reshape(1, 9, 2)
    box = np.asarray(points2bbox(jnp.asarray(pts), jnp.zeros(2), 0.01))[0]
    # mean (20, 50), unbiased std of [10,20,30]x3 = 8.66
    np.testing.assert_allclose(box, [20 - 8.66, 50 - 8.66, 20 + 8.66,
                                     50 + 8.66], atol=0.01)

    cfg = load_config(
        os.path.join(
            REPO, "configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py"
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(
        feat_channels=32, point_feat_channels=32, stacked_convs=1,
        num_classes=4,
    )
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    pack, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert set(losses) == {"loss_cls", "loss_pts_init", "loss_pts_refine"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, pack, nlp)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_double_head_rcnn_forward():
    """Double-Head R-CNN (reference double_bbox_head.py): conv-reg /
    fc-cls decoupled head in the standard two-stage detector."""
    cfg = load_config(
        os.path.join(
            REPO, "configs/double_heads/dh_faster_rcnn_r50_fpn_1x_coco.py"
        )
    )
    mc = shrink(cfg.model.to_dict())
    mc["roi_head"]["bbox_head"].update(
        conv_out_channels=32, fc_out_channels=32, num_classes=4
    )
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(losses["loss_cls"]) > 0
    dets, labels, valid = det.predict(variables, batch, anchors, nla)[:3]
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_deformable_detr_forward():
    """Deformable DETR (reference deformable_detr.py + MSDeformAttn):
    per-layer aux losses, gradients, decode; the MSDeformAttn op gets a
    golden check (uniform weights at a pixel center == that pixel)."""
    from boosting_rcnn_tpu.ops.ms_deform_attn import ms_deform_attn

    h, w, c = 4, 6, 8
    rs = np.random.RandomState(0)
    v = jnp.asarray(rs.rand(h * w, c).astype(np.float32))
    # one query sampling exactly pixel (1, 2) center on the single level
    loc = jnp.asarray(
        [[( (2 + 0.5) / w, (1 + 0.5) / h )]], jnp.float32
    ).reshape(1, 1, 1, 1, 2)
    wts = jnp.ones((1, 1, 1, 1), jnp.float32)
    out = ms_deform_attn(v, [(h, w)], jnp.tile(loc, (1, 2, 1, 1, 1)),
                         jnp.tile(wts, (1, 2, 1, 1)), num_heads=2)
    np.testing.assert_allclose(
        np.asarray(out)[0], np.asarray(v).reshape(h, w, c)[1, 2], atol=1e-5
    )

    cfg = load_config(
        os.path.join(
            REPO,
            "configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py",
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[16, 32, 64], out_channels=16)
    mc["bbox_head"].update(num_query=20, num_classes=4, embed_dims=16)
    mc["bbox_head"]["transformer"].update(
        num_heads=2, num_encoder_layers=1, num_decoder_layers=2,
        feedforward_channels=32,
    )
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch)
    # final + 1 aux decoder layer, 3 terms each
    assert "loss_cls" in losses and "loss_cls_aux0" in losses
    for k, v_ in losses.items():
        assert np.isfinite(float(v_)), (k, float(v_))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_cornernet_forward():
    """CornerNet (reference corner_head.py + hourglass.py): corner-pair
    detection — per-stack losses (heatmap/pull/push/offset), gradients,
    decode geometry (tl above-left of br)."""
    cfg = load_config(
        os.path.join(
            REPO,
            "configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py",
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(num_stacks=2, downsample_times=2, feat_channel=16)
    mc["bbox_head"].update(num_classes=4)
    mc["test_cfg"].update(corner_topk=16, max_per_img=8)
    det = build_detector(mc)
    # hourglass needs dims divisible by 2^(depth+2)
    canvas = (64, 64)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    pack, nlp = det.anchors_for(canvas)
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert "loss_heatmap" in losses and "loss_pull" in losses
    assert "loss_heatmap_aux0" in losses  # stack-0 aux losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, pack, nlp)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    d = np.asarray(dets)[np.asarray(valid)]
    if len(d):
        assert (d[:, 2] >= d[:, 0]).all() and (d[:, 3] >= d[:, 1]).all()


@pytest.mark.slow
def test_free_anchor_forward():
    """FreeAnchor (reference free_anchor_retina_head.py): positive-bag
    mean-max likelihood + saturated-IoU-downweighted negative loss."""
    cfg = load_config(
        os.path.join(
            REPO,
            "configs/free_anchor/retinanet_free_anchor_r50_fpn_1x_coco.py",
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(feat_channels=32, stacked_convs=1, num_classes=4,
                           pre_anchor_topk=8)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert set(losses) == {"positive_bag_loss", "negative_bag_loss"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) > 0, (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    gsum = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gsum) and gsum > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_autoassign_forward():
    """AutoAssign (reference autoassign_head.py): differentiable assignment
    with learnable center prior — losses, grads (incl. the prior params),
    decode."""
    cfg = load_config(
        os.path.join(REPO, "configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["bbox_head"].update(feat_channels=32, stacked_convs=1, num_classes=4)
    mc["test_cfg"]["nms_pre"] = 64
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    assert "center_prior" in variables["params"]
    pack, nlp = det.anchors_for(CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    assert set(losses) == {"loss_pos", "loss_neg", "loss_center"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def total(params):
        vv = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        ls = det.loss(vv, jax.random.PRNGKey(1), batch, pack, nlp)
        return sum(jnp.sum(x) for x in ls.values())

    g = jax.grad(total)(variables["params"])
    # the center prior itself receives gradient
    cp = sum(float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g["center_prior"]))
    assert np.isfinite(cp) and cp > 0
    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_fast_rcnn_external_proposals():
    """Fast R-CNN (reference detectors/fast_rcnn.py): RoI stages on
    externally supplied proposals, no RPN in the loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    mc = dict(
        type="FastRCNN",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=16,
                  num_outs=5),
        roi_head=dict(
            type="StandardRoIHead",
            bbox_roi_extractor=dict(roi_layer=dict(output_size=7),
                                    featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(type="Shared2FCBBoxHead", fc_out_channels=16,
                           num_classes=4)),
        train_cfg=dict(rcnn=dict(sampler=dict(num=8))),
        test_cfg=dict(rcnn=dict(score_thr=0.05, max_per_img=8)),
    )
    det = build_detector(mc)
    canvas = (64, 96)
    v = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    b = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    b.pop("ori_shape")
    b = {k: jnp.asarray(x) for k, x in b.items()}
    b["proposals"] = b["gt_bboxes"] + 2.0
    b["proposals_valid"] = b["gt_mask"]
    losses = det.loss(v, jax.random.PRNGKey(1), b, anchors, nla)
    assert set(losses) == {"loss_cls", "loss_bbox"}  # no RPN terms
    for k, val in losses.items():
        assert np.isfinite(float(val)), (k, float(val))
    dets, labels, valid = det.predict(v, b, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.parametrize("variant", ["refine", "twostage_refine"])
@pytest.mark.slow
def test_deformable_detr_refine_variants(variant):
    """Iterative box refinement + encoder-proposal two-stage (reference
    deformable_detr_refine / _twostage_refine configs): per-layer heads,
    detached reference updates, and for two-stage the encoder outputs join
    the aux-loss stack (one extra layer)."""
    cfg = load_config(
        os.path.join(
            REPO,
            f"configs/deformable_detr/deformable_detr_{variant}_r50_16x2"
            "_50e_coco.py",
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[16, 32, 64], out_channels=16)
    mc["bbox_head"].update(num_query=20, num_classes=4, embed_dims=16)
    mc["bbox_head"]["transformer"].update(
        num_heads=2, num_encoder_layers=1, num_decoder_layers=2,
        feedforward_channels=32,
    )
    det = build_detector(mc)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    batch = demo_batch(4)

    losses = det.loss(variables, jax.random.PRNGKey(1), batch)
    # refine: 2 decoder layers -> 1 aux set; two-stage adds the enc layer
    n_aux = 1 if variant == "refine" else 2
    assert "loss_cls" in losses
    assert f"loss_cls_aux{n_aux - 1}" in losses
    assert f"loss_cls_aux{n_aux}" not in losses
    for k, v in losses.items():
        assert np.isfinite(float(np.asarray(v))), (k, v)

    # per-layer heads exist (refine deep-copies branches in the reference)
    params = variables["params"]
    assert "cls_head_0" in params and "cls_head_1" in params
    if variant == "twostage_refine":
        assert "enc_cls_head" in params
        assert "query_embed" not in params  # queries come from proposals

    dets, labels, valid = det.predict(variables, batch)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_ssdlite_forward():
    """SSDLite (reference ssdlite_mobilenetv2_scratch_600e_coco):
    MobileNetV2 (4, 7) + depthwise SSDNeck extras + depthwise prediction
    convs at 320x320, explicit anchor sizes."""
    cfg = load_config(os.path.join(
        REPO, "configs/ssd/ssdlite_mobilenetv2_scratch_600e_coco.py"))
    mc = cfg.model.to_dict()
    mc["bbox_head"]["num_classes"] = 4
    det = build_detector(mc)
    canvas = (320, 320)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    # 6 anchors per location on every level (ratio 1 x2 scales + 2,3 pairs)
    assert anchors.shape[0] == sum(
        n * 6 for n in (20 * 20, 10 * 10, 5 * 5, 3 * 3, 2 * 2, 1 * 1))
    loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
