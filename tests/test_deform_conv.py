"""Deformable conv v1/v2 vs an independent numpy implementation of the mmcv
semantics (interleaved (dy,dx) offsets per row-major tap, zero padding
outside, sigmoid mask for v2).  torchvision is absent in this image, so the
oracle is hand-written from the mmcv kernel spec."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from boosting_rcnn_tpu.ops.deform_conv import (
    deform_conv2d,
    split_modulated_offset,
)


def np_deform_conv(x, offset, weight, mask, stride, padding, dilation, dg):
    """Oracle: direct per-position loops (NHWC)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    kk = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    cg = cin // dg
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, yy, xx):  # (H, W, Cg) zero-padded bilinear
        if yy <= -1 or yy >= h or xx <= -1 or xx >= w:
            return np.zeros(img.shape[-1])
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        v = np.zeros(img.shape[-1])
        for dy2, dx2 in ((0, 0), (0, 1), (1, 0), (1, 1)):
            yi, xi = y0 + dy2, x0 + dx2
            if 0 <= yi < h and 0 <= xi < w:
                wgt = (1 - abs(yy - yi)) * (1 - abs(xx - xi))
                v += wgt * img[yi, xi]
        return v

    for bi in range(b):
        for i in range(ho):
            for j in range(wo):
                acc = np.zeros(cout)
                for ki in range(kh):
                    for kj in range(kw):
                        t = ki * kw + kj
                        for g in range(dg):
                            dy = offset[bi, i, j, (g * kk + t) * 2]
                            dx = offset[bi, i, j, (g * kk + t) * 2 + 1]
                            yy = i * stride - padding + ki * dilation + dy
                            xx = j * stride - padding + kj * dilation + dx
                            v = sample(
                                x[bi, :, :, g * cg : (g + 1) * cg], yy, xx
                            )
                            if mask is not None:
                                v = v * mask[bi, i, j, g * kk + t]
                            acc += v @ weight[
                                ki, kj, g * cg : (g + 1) * cg
                            ]
                out[bi, i, j] = acc
    return out


def test_zero_offset_equals_plain_conv():
    """DeformConv2dPack zero-inits its offset conv, so at init DCN must
    equal a plain conv (mmcv behaviour detectors rely on for pretrained
    warm starts)."""
    rs = np.random.RandomState(0)
    x = rs.randn(2, 9, 11, 6).astype(np.float32)
    w = rs.randn(3, 3, 6, 4).astype(np.float32)
    off = np.zeros((2, 9, 11, 18), np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w))
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_v1_random_offsets_vs_numpy():
    rs = np.random.RandomState(1)
    x = rs.randn(1, 7, 8, 4).astype(np.float32)
    w = rs.randn(3, 3, 4, 5).astype(np.float32)
    off = (rs.randn(1, 7, 8, 18) * 1.5).astype(np.float32)
    got = np.asarray(
        deform_conv2d(jnp.asarray(x), jnp.asarray(off), jnp.asarray(w))
    )
    ref = np_deform_conv(x, off, w, None, 1, 1, 1, 1)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_v2_mask_groups_stride_dilation_vs_numpy():
    rs = np.random.RandomState(2)
    b, h, w_, cin, cout, dg = 2, 9, 10, 6, 3, 2
    stride, pad, dil = 2, 2, 2
    kh = kw = 3
    kk = kh * kw
    ho = (h + 2 * pad - dil * (kh - 1) - 1) // stride + 1
    wo = (w_ + 2 * pad - dil * (kw - 1) - 1) // stride + 1
    x = rs.randn(b, h, w_, cin).astype(np.float32)
    wt = rs.randn(kh, kw, cin, cout).astype(np.float32)
    raw = (rs.randn(b, ho, wo, dg * 3 * kk)).astype(np.float32)
    off, mask = split_modulated_offset(jnp.asarray(raw), dg, kk)
    got = np.asarray(
        deform_conv2d(
            jnp.asarray(x), off, jnp.asarray(wt), mask=mask,
            stride=stride, padding=pad, dilation=dil, deform_groups=dg,
        )
    )
    ref = np_deform_conv(
        x, np.asarray(off), wt, np.asarray(mask), stride, pad, dil, dg
    )
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # mask layout: logits chunked (o1, o2, m) then sigmoid
    np.testing.assert_allclose(
        np.asarray(mask), 1 / (1 + np.exp(-raw[..., dg * 2 * kk :])), atol=1e-6
    )


def test_deform_conv_gradients_finite():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(1, 6, 6, 4).astype(np.float32))
    w = jnp.asarray(rs.randn(3, 3, 4, 4).astype(np.float32))
    off = jnp.asarray((rs.randn(1, 6, 6, 18) * 0.5).astype(np.float32))

    def f(params):
        return jnp.sum(deform_conv2d(x, params["off"], params["w"]) ** 2)

    g = jax.grad(f)({"off": off, "w": w})
    assert np.isfinite(np.asarray(g["off"])).all()
    assert np.isfinite(np.asarray(g["w"])).all()
    assert float(jnp.abs(g["off"]).sum()) > 0  # offsets receive gradient


@pytest.mark.slow
def test_dcn_detector_forward_train_smoke():
    """DCN wiring end-to-end: boosting detector with DCNv2 backbone stages
    and last_conv='dcn' RPN tower builds, computes finite losses, takes a
    gradient, and predicts (reference boosting_rcnn_r2_101_dcn config
    surface + atss_rpn_head.py last_conv option)."""
    import os
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, REPO)
    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        os.path.join(
            REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py"
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(
        depth=50,
        base_channels=8,
        dcn=dict(type="DCNv2", deform_groups=1),
        stage_with_dcn=(False, True, True, True),
    )
    mc["neck"].update(in_channels=[32, 64, 128, 256], out_channels=32)
    mc["rpn_head"].update(feat_channels=32, stacked_convs=2, last_conv="dcn")
    mc["roi_head"]["bbox_head"]["fc_out_channels"] = 32
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=32)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 16
    mc["test_cfg"]["rpn"].update(nms_pre=48, max_per_img=16)

    det = build_detector(mc)
    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    # zero-init offset convs present in both backbone and rpn tower
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    off_paths = [
        "/".join(str(getattr(k, "key", k)) for k in path)
        for path, _ in flat
        if "conv_offset" in str(path)
    ]
    assert any("backbone" in p for p in off_paths)
    assert any("rpn" in p for p in off_paths)

    anchors, nla = det.anchors_for(canvas)
    loader = FakeDetLoader(
        batch_size=1, canvas=canvas, num_classes=4, num_batches=1
    )
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    def total_loss(params):
        v = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        losses = det.loss(v, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in losses.values())

    val, grads = jax.value_and_grad(total_loss)(variables["params"])
    assert np.isfinite(float(val))
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0

    dets, labels, valid = det.predict(variables, batch, anchors, nla)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()
