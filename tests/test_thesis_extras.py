"""Thesis-extras subset (VERDICT r2 item 10): EMAU / FP-EMAU / HiddenMixup
backbone + contrastive losses (reference
``detectors/faster_rcnn.py:849-1010``, ``backbones/hiddenMixupResnet.py``).
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.models.thesis_extras import (
    EMAU,
    FPEMAU,
    HiddenMixupResNet,
    channel_contrastive_loss,
    mixup_data,
    spatial_contrastive_loss,
)


def test_emau_forward_and_basis():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 10, 16), jnp.float32)
    m = EMAU(k=8, stage_num=3)
    variables = m.init(jax.random.PRNGKey(0), x)
    out, mu = m.apply(variables, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # mu columns are l2-normalized over channels
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(mu), axis=1), 1.0, atol=1e-3)
    # no gradient flows through the EM iterations into mu0
    g = jax.grad(
        lambda v: jnp.sum(m.apply(v, x)[0].astype(jnp.float32))
    )(variables)
    assert np.isfinite(
        np.asarray(g["params"]["conv1"]["kernel"])).all()


def test_fp_emau_shares_basis_across_levels():
    rs = np.random.RandomState(1)
    feats = tuple(
        jnp.asarray(rs.randn(1, s, s, 8), jnp.float32) for s in (16, 8, 4))
    m = FPEMAU(k=4, stage_num=2)
    variables = m.init(jax.random.PRNGKey(0), feats)
    outs, mu = m.apply(variables, feats)
    assert len(outs) == 3
    for o, f in zip(outs, feats):
        assert o.shape == f.shape and np.isfinite(np.asarray(o)).all()
    # one shared conv parameter set; mu is a buffer (reference registers it
    # with register_buffer and updates it under no_grad)
    assert set(variables["params"]) == {"conv1", "conv2", "bn2"}
    assert "mu" in variables["batch_stats"]
    # a mutable apply EMA-updates the buffer toward the batch mu
    _, upd = m.apply(variables, feats, mutable=["batch_stats"])
    new_mu = np.asarray(upd["batch_stats"]["mu"])
    old_mu = np.asarray(variables["batch_stats"]["mu"])
    expect = 0.9 * old_mu + 0.1 * np.asarray(mu).mean(axis=0)
    np.testing.assert_allclose(new_mu, expect, atol=1e-5)
    # a non-mutable apply leaves it untouched (inference path)
    assert np.abs(new_mu - old_mu).max() > 0


def test_contrastive_losses_golden():
    x = jnp.ones((1, 8, 8, 16))
    assert float(spatial_contrastive_loss(x, x)) == 0.0
    assert float(channel_contrastive_loss(x, x)) == 0.0
    y = x + 1.0
    # squared diff 1 everywhere; margin 0.01 -> 0.99 after hinge
    np.testing.assert_allclose(
        float(spatial_contrastive_loss(x, y)), 0.99, atol=1e-6)
    np.testing.assert_allclose(
        float(channel_contrastive_loss(x, y)), 1.0, atol=1e-6)


def test_hidden_mixup_resnet_two_view():
    from boosting_rcnn_tpu.models.backbones.resnet import ResNet

    m = HiddenMixupResNet(
        resnet=ResNet(depth=18, base_channels=8, norm_eval=True))
    rs = np.random.RandomState(2)
    x1 = jnp.asarray(rs.randn(1, 64, 64, 3), jnp.float32)
    x2 = jnp.asarray(rs.randn(1, 64, 64, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x1)
    # single view == plain backbone
    outs = m.apply(variables, x1)
    assert len(outs) == 4
    # two views: contrastive aux + mixed hidden states
    outs_mix, closs = m.apply(
        variables, x1, x2, mix_rng=jax.random.PRNGKey(3), train=True)
    assert float(closs) > 0
    assert len(outs_mix) == 4
    # stage-0 output is view-1's (no mix at the first level)
    np.testing.assert_allclose(
        np.asarray(outs_mix[0]), np.asarray(outs[0]), atol=1e-6)
    # deeper levels are blends, not equal to either view
    o1 = np.asarray(m.apply(variables, x1)[2])
    assert np.abs(np.asarray(outs_mix[2]) - o1).max() > 1e-5


def test_suodac_domain_labels_feed_dg_components(tmp_path):
    """SUO-DAC bridge (VERDICT r2 weak-7): the loader's domain labels
    select cross-domain view pairs which the DG model components
    (HiddenMixup two-view backbone + contrastive loss) consume."""
    import json

    import cv2

    from boosting_rcnn_tpu.data.coco import CocoDataset
    from boosting_rcnn_tpu.data.loader import DetDataLoader
    from boosting_rcnn_tpu.models.backbones.resnet import ResNet

    anns = {
        "images": [
            {"id": i + 1, "file_name": f"img_{i}.jpg", "width": 64,
             "height": 64} for i in range(4)
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
    dom = tmp_path / "domains"
    dom.mkdir()
    (dom / "type1.txt").write_text("img_0\nimg_1\n")
    (dom / "type2.txt").write_text("img_2\nimg_3\n")

    ds = CocoDataset(str(tmp_path / "ann.json"), img_prefix=str(tmp_path))
    loader = DetDataLoader(
        ds, batch_size=4, canvas=(64, 64), scale=(64, 64), train=True,
        flip_prob=0.0, max_gt=5, prefetch=1, domain_file=str(dom),
    )
    batch = next(loader.epoch_iter(0))
    assert batch["domain_label"].shape == (4, 2)
    d = batch["domain_label"].argmax(-1)
    assert set(d.tolist()) == {0, 1}

    # cross-domain pairing -> two-view forward with contrastive aux
    i0 = int(np.where(d == 0)[0][0])
    i1 = int(np.where(d == 1)[0][0])
    x1 = jnp.asarray(batch["images"][i0:i0 + 1])
    x2 = jnp.asarray(batch["images"][i1:i1 + 1])
    m = HiddenMixupResNet(
        resnet=ResNet(depth=18, base_channels=8, norm_eval=True))
    variables = m.init(jax.random.PRNGKey(0), x1)
    outs, closs = m.apply(
        variables, x1, x2, mix_rng=jax.random.PRNGKey(1), train=True)
    assert len(outs) == 4 and np.isfinite(float(closs))
