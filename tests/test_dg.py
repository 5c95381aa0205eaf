"""DG detector wrappers (reference ``detectors/faster_rcnn.py:47-729``):
DANN gradient reversal + alpha schedule, JiGEN jigsaw auxiliary, DGaug
style-transferred training view, and the loader keys that feed them.
"""
import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.builder import build_detector
from boosting_rcnn_tpu.models.detectors.dg import grad_reverse

CANVAS = (96, 128)


def _tiny_model(t, **extra):
    mc = dict(
        type=t,
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      out_indices=(0, 1, 2, 3), norm_eval=True),
        neck=dict(type="FPN", in_channels=[8, 16, 32, 64], out_channels=32,
                  num_outs=5),
        rpn_head=dict(
            type="RPNHead",
            anchor_generator=dict(
                type="AnchorGenerator", scales=[8], ratios=[0.5, 1.0, 2.0],
                strides=[4, 8, 16, 32, 64]),
            bbox_coder=dict(type="DeltaXYWHBBoxCoder"),
        ),
        roi_head=dict(
            type="StandardRoIHead",
            bbox_roi_extractor=dict(
                type="SingleRoIExtractor",
                roi_layer=dict(type="RoIAlign", output_size=7),
                featmap_strides=[4, 8, 16, 32]),
            bbox_head=dict(type="Shared2FCBBoxHead", num_classes=4,
                           fc_out_channels=32),
        ),
        train_cfg=dict(
            rpn=dict(assigner=dict(pos_iou_thr=0.7, neg_iou_thr=0.3)),
            rpn_proposal=dict(nms_pre=64, max_per_img=32,
                              nms=dict(iou_threshold=0.7)),
            rcnn=dict(
                assigner=dict(pos_iou_thr=0.5, neg_iou_thr=0.5),
                sampler=dict(num=16, pos_fraction=0.25),
            ),
        ),
        test_cfg=dict(
            rpn=dict(nms_pre=48, max_per_img=16,
                     nms=dict(iou_threshold=0.7)),
            rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5),
                      max_per_img=8),
        ),
    )
    mc.update(extra)
    return mc


def _batch(b=2, extra_keys=()):
    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.randn(b, *CANVAS, 3), jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.tile(np.array([[8.0, 8.0, 48.0, 40.0]], np.float32),
                    (b, 3, 1))),
        "gt_labels": jnp.zeros((b, 3), jnp.int32),
        "gt_mask": jnp.ones((b, 3), bool),
        "img_shape": jnp.asarray([[CANVAS[0], CANVAS[1]]] * b, jnp.float32),
    }
    if "domain_label" in extra_keys:
        batch["domain_label"] = jnp.asarray(
            np.eye(2, dtype=np.float32)[rng.randint(0, 2, size=b)])
    if "jig" in extra_keys:
        batch["img_puzzle"] = batch["images"][:, ::-1]
        one_hot = np.zeros((b, 31), np.float32)
        one_hot[:, 5] = 1.0
        batch["jig_labels"] = jnp.asarray(one_hot)
    if "img_aug" in extra_keys:
        batch["img_aug"] = batch["images"] * 0.5
    return batch


def test_grad_reverse():
    """Forward identity; backward -alpha*g (reference ReverseLayerF)."""
    x = jnp.asarray([1.0, -2.0, 3.0])
    alpha = jnp.asarray(0.7)
    y, vjp = jax.vjp(lambda v: grad_reverse(v, alpha), x)
    np.testing.assert_allclose(y, x)
    (gx,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(gx, -0.7 * np.ones(3), rtol=1e-6)


@pytest.mark.slow
def test_dg_faster_rcnn_loss_and_reversal():
    det = build_detector(_tiny_model(
        "DGFasterRCNN", num_domains=2, total_img=64.0))
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = _batch(extra_keys=("domain_label",))
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_domain" in losses
    assert np.isfinite(float(losses["loss_domain"]))
    # alpha counter lives in batch_stats and advances under a mutable apply
    assert "count" in variables["batch_stats"]["domain_head"]

    # gradient reversal: the domain loss's gradient wrt a backbone param
    # must be the NEGATED, alpha-scaled gradient of the unreversed loss.
    # With the counter at 0 and total_img=64, the batch of 2 gives
    # p=2/64 -> alpha = 2/(1+exp(-10*2/64))-1.
    def domain_loss(params, reverse):
        from boosting_rcnn_tpu.models.detectors.dg import DomainClassifier
        from boosting_rcnn_tpu.models.detectors.two_stage import TwoStageNet

        v = {"params": params, "batch_stats": variables["batch_stats"]}
        feats, d_pred = det.net.apply(
            v, batch["images"], method=TwoStageNet.features_dg)
        style = jnp.argmax(batch["domain_label"], axis=-1)
        logp = jax.nn.log_softmax(d_pred, axis=-1)
        return -jnp.take_along_axis(logp, style[:, None], axis=-1).mean()

    g = jax.grad(domain_loss)(variables["params"], True)
    gb = jax.tree.leaves(g["backbone"])
    gd = jax.tree.leaves(g["domain_head"])
    # domain-head params get the plain CE gradient (non-zero), while the
    # backbone sees the reversed (still non-zero) gradient
    assert any(float(jnp.abs(x).max()) > 0 for x in gd)
    assert any(float(jnp.abs(x).max()) > 0 for x in gb)
    p = 2.0 / 64.0
    alpha = 2.0 / (1.0 + np.exp(-10.0 * p)) - 1.0
    # sign/scale check against a reversal-free replica: scale the reversed
    # gradient by -1/alpha and it must equal the unreversed one
    import boosting_rcnn_tpu.models.detectors.dg as dg_mod

    orig = dg_mod.grad_reverse
    try:
        dg_mod.grad_reverse = lambda x, a: x
        g_plain = jax.grad(domain_loss)(variables["params"], False)
    finally:
        dg_mod.grad_reverse = orig
    for a, b in zip(jax.tree.leaves(g["backbone"]),
                    jax.tree.leaves(g_plain["backbone"])):
        np.testing.assert_allclose(
            np.asarray(a), -alpha * np.asarray(b), rtol=1e-4, atol=1e-7)


@pytest.mark.slow
def test_dg_counter_advances_in_train_step():
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    det = build_detector(_tiny_model(
        "DGFasterRCNN", num_domains=2, total_img=64.0))
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    tx = make_optimizer(lambda s: 0.01, params=variables["params"])
    state = create_train_state(variables, tx)
    step = make_train_step(det, anchors, nla)
    batch = _batch(extra_keys=("domain_label",))
    state2, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(2))
    assert float(state2.batch_stats["domain_head"]["count"]) == 2.0
    assert np.isfinite(float(metrics["loss_domain"]))
    # aux adam branch: domain-head params must have moved
    d0 = jax.tree.leaves(state.params["domain_head"])
    d1 = jax.tree.leaves(state2.params["domain_head"])
    assert any(
        float(jnp.abs(a - b).max()) > 0 for a, b in zip(d0, d1))


@pytest.mark.slow
def test_jigen_loss():
    det = build_detector(_tiny_model("JiGENFasterRCNN", jig_classes=31))
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = _batch(extra_keys=("jig",))
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    assert "loss_jig" in losses and np.isfinite(float(losses["loss_jig"]))


def test_dgaug_uses_aug_view():
    det = build_detector(_tiny_model(
        "DGaugFasterRCNN", backbone=dict(
            type="HiddenMixupResNet", depth=18, base_channels=8,
            out_indices=(0, 1, 2, 3), norm_eval=True)))
    # backbone override: _tiny_model's default is replaced wholesale
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    batch = _batch(extra_keys=("img_aug",))
    l_aug = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    batch2 = dict(batch)
    batch2.pop("img_aug")
    l_plain = det.loss(variables, jax.random.PRNGKey(1), batch2, anchors, nla)
    # the augmented view must actually be consumed
    assert float(l_aug["loss_cls"]) != float(l_plain["loss_cls"])
    for v in l_aug.values():
        assert np.isfinite(float(v))


def test_loader_jigsaw_and_dgaug_keys(tmp_path):
    """The loader emits img_puzzle/jig_labels (jigsaw=) and img_aug
    (dgaug=) with the right shapes; puzzle id 0 is the identity."""
    import json

    import cv2

    from boosting_rcnn_tpu.data.coco import CocoDataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    anns = {
        "images": [
            {"id": i + 1, "file_name": f"img_{i}.jpg",
             "width": 64, "height": 64}
            for i in range(4)
        ],
        "categories": [{"id": 1, "name": "fish"}],
        "annotations": [
            {"id": i + 1, "image_id": i + 1, "category_id": 1,
             "bbox": [8, 8, 30, 30], "area": 900, "iscrowd": 0}
            for i in range(4)
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(anns))
    rs = np.random.RandomState(0)
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"img_{i}.jpg"),
                    (rs.rand(64, 64, 3) * 255).astype(np.uint8))
    ds = CocoDataset(str(tmp_path / "ann.json"), img_prefix=str(tmp_path))
    loader = DetDataLoader(
        ds, batch_size=2, canvas=(64, 96), scale=(96, 64), train=True,
        flip_prob=0.0, jigsaw=8, dgaug=True, seed=0, prefetch=1,
    )
    batch = next(loader.epoch_iter(0))
    assert batch["img_puzzle"].shape == batch["images"].shape
    assert batch["jig_labels"].shape == (2, 8)
    np.testing.assert_allclose(batch["jig_labels"].sum(-1), 1.0)
    assert batch["img_aug"].shape == batch["images"].shape
    assert np.isfinite(batch["img_aug"]).all()
    # identity permutation row 0
    assert (loader.jig_perms[0] == np.arange(9)).all()
    # permuted image has the same multiset of pixels in the tiled crop
    im, pz = batch["images"][0], batch["img_puzzle"][0]
    h3, w3 = im.shape[0] // 3 * 3, im.shape[1] // 3 * 3
    np.testing.assert_allclose(
        np.sort(im[:h3, :w3].ravel()), np.sort(pz[:h3, :w3].ravel()),
        rtol=1e-6)


def test_loader_domain_file_json_threads_domain_label(tmp_path):
    """Real-loader DG path: a json domain_file (the layout
    configs/_base_/datasets/suodac_detection.py declares) reaches the
    batch as one-hot domain_label keyed by image stem."""
    import json

    import cv2

    from boosting_rcnn_tpu.data.coco import CocoDataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader

    anns = {
        "images": [
            {"id": i + 1, "file_name": f"img_{i}.jpg",
             "width": 64, "height": 64}
            for i in range(4)
        ],
        "categories": [{"id": 1, "name": "fish"}],
        "annotations": [
            {"id": i + 1, "image_id": i + 1, "category_id": 1,
             "bbox": [8, 8, 30, 30], "area": 900, "iscrowd": 0}
            for i in range(4)
        ],
    }
    (tmp_path / "ann.json").write_text(json.dumps(anns))
    (tmp_path / "domains.json").write_text(json.dumps(
        {f"img_{i}": i % 2 for i in range(4)}))
    rs = np.random.RandomState(0)
    for i in range(4):
        cv2.imwrite(str(tmp_path / f"img_{i}.jpg"),
                    (rs.rand(64, 64, 3) * 255).astype(np.uint8))
    ds = CocoDataset(str(tmp_path / "ann.json"), img_prefix=str(tmp_path))
    loader = DetDataLoader(
        ds, batch_size=4, canvas=(64, 96), scale=(96, 64), train=True,
        flip_prob=0.0, domain_file=str(tmp_path / "domains.json"),
        seed=0, prefetch=1,
    )
    batch = next(loader.epoch_iter(0))
    dl = batch["domain_label"]
    assert dl.shape == (4, 2)
    np.testing.assert_allclose(dl.sum(-1), 1.0)
    # both domains must actually appear (donor-0-only would collapse this)
    assert set(np.argmax(dl, -1).tolist()) == {0, 1}
