"""Deformable RoI pooling vs an independent numpy oracle (mmcv
``deform_roi_pool`` spec: bin sample points shifted by offset * roi size *
gamma, zero outside, average over the sampling grid)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from boosting_rcnn_tpu.ops.deform_roi_pool import (
    deform_roi_pool,
    multilevel_deform_roi_pool,
)


def np_deform_roi_pool(feat, rois, offsets, s, scale, n, gamma):
    h, w, c = feat.shape
    r = rois.shape[0]
    out = np.zeros((r, s, s, c), np.float64)

    def sample(yy, xx):
        if yy <= -1 or yy >= h or xx <= -1 or xx >= w:
            return np.zeros(c)
        y0, x0 = int(np.floor(yy)), int(np.floor(xx))
        v = np.zeros(c)
        for dy in (0, 1):
            for dx in (0, 1):
                yi, xi = y0 + dy, x0 + dx
                if 0 <= yi < h and 0 <= xi < w:
                    v += (1 - abs(yy - yi)) * (1 - abs(xx - xi)) * feat[yi, xi]
        return v

    for ri in range(r):
        x1, y1 = rois[ri, 0] * scale, rois[ri, 1] * scale
        rw = max(rois[ri, 2] * scale - x1, 1.0)
        rh = max(rois[ri, 3] * scale - y1, 1.0)
        bw, bh = rw / s, rh / s
        for ph in range(s):
            for pw in range(s):
                acc = np.zeros(c)
                for iy in range(n):
                    for ix in range(n):
                        yy = y1 + bh * (ph + (iy + 0.5) / n)
                        xx = x1 + bw * (pw + (ix + 0.5) / n)
                        if offsets is not None:
                            xx += offsets[ri, ph, pw, 0] * gamma * rw
                            yy += offsets[ri, ph, pw, 1] * gamma * rh
                        acc += sample(yy, xx)
                out[ri, ph, pw] = acc / (n * n)
    return out


def test_deform_roi_pool_vs_numpy():
    rs = np.random.RandomState(0)
    feat = rs.rand(20, 28, 6).astype(np.float32)
    rois = np.array(
        [[8, 8, 120, 96], [0, 0, 40, 40], [200, 100, 440, 300],
         [30, 20, 31, 21]], np.float32)
    offsets = (rs.randn(4, 5, 5, 2) * 0.5).astype(np.float32)
    got = deform_roi_pool(
        jnp.asarray(feat), jnp.asarray(rois), jnp.asarray(offsets),
        out_size=5, spatial_scale=1 / 16, sampling_ratio=2, gamma=0.1)
    want = np_deform_roi_pool(feat, rois, offsets, 5, 1 / 16, 2, 0.1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_zero_offsets_match_plain_pooling():
    """With zero offsets the op is average-pooled RoIAlign sampling — it
    must agree with its own no-offset branch exactly."""
    rs = np.random.RandomState(1)
    feat = rs.rand(16, 24, 4).astype(np.float32)
    rois = np.array([[10, 10, 100, 120], [40, 8, 300, 200]], np.float32)
    a = deform_roi_pool(jnp.asarray(feat), jnp.asarray(rois), None,
                        out_size=7, spatial_scale=1 / 16)
    b = deform_roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                        jnp.zeros((2, 7, 7, 2)), out_size=7,
                        spatial_scale=1 / 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multilevel_routing_and_grads():
    rs = np.random.RandomState(2)
    feats = tuple(
        jnp.asarray(rs.rand(64 // (2 ** i), 80 // (2 ** i), 8)
                    .astype(np.float32))
        for i in range(4)
    )
    rois = jnp.asarray(
        np.array([[4, 4, 60, 60], [8, 8, 200, 180], [0, 0, 250, 250]],
                 np.float32))
    valid = jnp.asarray([True, True, False])

    def f(off):
        out = multilevel_deform_roi_pool(
            feats, rois, valid, (4, 8, 16, 32), off, out_size=7)
        return jnp.sum(out ** 2)

    off = jnp.asarray((rs.randn(3, 7, 7, 2) * 0.3).astype(np.float32))
    g = jax.grad(f)(off)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g[:2]).sum()) > 0.0
    # invalid roi contributes nothing
    assert float(jnp.abs(g[2]).sum()) == 0.0


def test_pack_module_starts_as_plain_pooling():
    """Zero-init offset FC: at init the pack equals no-offset pooling."""
    from boosting_rcnn_tpu.models.roi_heads.deform_roi_pool_pack import (
        DeformRoIPoolPack,
    )

    rs = np.random.RandomState(3)
    feats = tuple(
        jnp.asarray(rs.rand(32 // (2 ** i), 40 // (2 ** i), 8)
                    .astype(np.float32))
        for i in range(4)
    )
    rois = jnp.asarray(np.array([[4, 4, 80, 60], [8, 8, 100, 90]],
                                np.float32))
    valid = jnp.ones((2,), bool)
    bf = tuple(f[None] for f in feats)  # batched (B=1) module interface
    mod = DeformRoIPoolPack(out_size=7, deform_fc_channels=32)
    v = mod.init(jax.random.PRNGKey(0), bf, rois[None], valid[None])
    got = mod.apply(v, bf, rois[None], valid[None])
    want = multilevel_deform_roi_pool(
        feats, rois, valid, (4, 8, 16, 32), None, out_size=7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
