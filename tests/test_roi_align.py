"""RoIAlign correctness: bilinear numerics vs a numpy reference, level routing."""
import pytest
import numpy as np

import boosting_rcnn_tpu.ops.roi_align as ra


def np_roi_align(feat_hw, roi, scale, out=7, s=2):
    """Dense numpy RoIAlign (aligned=True), feat (H, W)."""
    h, w = feat_hw.shape

    def bilinear(y, x):
        if y < -1 or y > h or x < -1 or x > w:
            return 0.0
        x = min(max(x, 0), w - 1)
        y = min(max(y, 0), h - 1)
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        lx, ly = x - x0, y - y0
        return (
            feat_hw[y0, x0] * (1 - ly) * (1 - lx)
            + feat_hw[y0, x1] * (1 - ly) * lx
            + feat_hw[y1, x0] * ly * (1 - lx)
            + feat_hw[y1, x1] * ly * lx
        )

    x1, y1, x2, y2 = roi
    x1, y1, x2, y2 = x1 * scale - 0.5, y1 * scale - 0.5, x2 * scale - 0.5, y2 * scale - 0.5
    bw, bh = (x2 - x1) / out, (y2 - y1) / out
    res = np.zeros((out, out))
    for i in range(out):
        for j in range(out):
            acc = 0.0
            for ky in range(s):
                for kx in range(s):
                    yy = y1 + (i + (ky + 0.5) / s) * bh
                    xx = x1 + (j + (kx + 0.5) / s) * bw
                    acc += bilinear(yy, xx)
            res[i, j] = acc / (s * s)
    return res


def test_single_level_matches_numpy(rng):
    h, w, c = 24, 32, 3
    feat = rng.rand(h, w, c).astype(np.float32)
    rois = np.array([[4.0, 4.0, 60.0, 44.0], [0.0, 0.0, 20.0, 20.0]], np.float32)
    got = np.asarray(ra.roi_align(feat, rois, spatial_scale=0.5, out_size=7))
    for r in range(2):
        for ch in range(c):
            exp = np_roi_align(feat[:, :, ch], rois[r], 0.5)
            np.testing.assert_allclose(got[r, :, :, ch], exp, rtol=1e-4, atol=1e-5)


def test_map_roi_levels():
    # scale thresholds at finest_scale=56: lvl = floor(log2(sqrt(wh)/56))
    rois = np.array(
        [
            [0, 0, 40, 40],  # 40 < 56 -> lvl 0
            [0, 0, 113, 113],  # ~2x56 -> lvl 1
            [0, 0, 230, 230],  # ~4x56 -> lvl 2
            [0, 0, 1000, 1000],  # clamped to max
        ],
        np.float32,
    )
    lvl = np.asarray(ra.map_roi_levels(rois, num_levels=4))
    np.testing.assert_array_equal(lvl, [0, 1, 2, 3])


def test_multilevel_routing_equivalence(rng):
    """A RoI routed to level l must equal single-level RoIAlign on level l."""
    c = 4
    feats = [rng.rand(32, 40, c).astype(np.float32) for _ in range(2)]
    feats.append(rng.rand(16, 20, c).astype(np.float32))
    feats.append(rng.rand(8, 10, c).astype(np.float32))
    strides = [8, 16, 32, 64]
    rois = np.array(
        [
            [8.0, 8.0, 50.0, 50.0],  # small -> lvl0
            [0.0, 0.0, 120.0, 110.0],  # -> lvl1
        ],
        np.float32,
    )
    valid = np.ones(2, bool)
    got = np.asarray(
        ra.multilevel_roi_align(feats, rois, valid, strides, out_size=7)
    )
    exp0 = np.asarray(ra.roi_align(feats[0], rois[:1], 1.0 / strides[0]))
    exp1 = np.asarray(ra.roi_align(feats[1], rois[1:], 1.0 / strides[1]))
    np.testing.assert_allclose(got[0], exp0[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[1], exp1[0], rtol=1e-4, atol=1e-5)


def test_invalid_rois_zeroed(rng):
    feats = [rng.rand(16, 16, 2).astype(np.float32)]
    rois = np.array([[0, 0, 30, 30]], np.float32)
    out = np.asarray(
        ra.multilevel_roi_align(feats, rois, np.zeros(1, bool), [8])
    )
    assert (out == 0).all()


def test_fast_matches_exact(rng):
    """Separable-matmul RoIAlign == gather RoIAlign for realistic rois."""
    c = 8
    feats = [
        rng.rand(64, 80, c).astype(np.float32),
        rng.rand(32, 40, c).astype(np.float32),
        rng.rand(16, 20, c).astype(np.float32),
        rng.rand(8, 10, c).astype(np.float32),
        rng.rand(4, 5, c).astype(np.float32),
    ]
    strides = [8, 16, 32, 64, 128]
    n = 30
    ar = rng.rand(n) * 2.5 + 0.4  # aspect <= ~3
    sc = rng.rand(n) * 250 + 12
    w = sc * np.sqrt(ar)
    h = sc / np.sqrt(ar)
    x1 = rng.rand(n) * np.clip(640 - w, 1, None)
    y1 = rng.rand(n) * np.clip(512 - h, 1, None)
    rois = np.stack(
        [x1, y1, np.minimum(x1 + w, 639), np.minimum(y1 + h, 511)], -1
    ).astype(np.float32)
    valid = np.ones(n, bool)
    exact = np.asarray(ra.multilevel_roi_align(feats, rois, valid, strides))
    fast = np.asarray(ra.multilevel_roi_align_fast(feats, rois, valid, strides))
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-5)


def test_fast_invalid_rois_zeroed(rng):
    feats = [rng.rand(16, 16, 2).astype(np.float32)]
    rois = np.array([[0, 0, 30, 30]], np.float32)
    out = np.asarray(
        ra.multilevel_roi_align_fast(feats, rois, np.zeros(1, bool), [8])
    )
    assert (out == 0).all()


def test_pallas_kernel_matches_fast(rng):
    """Fused Pallas RoIAlign (interpret mode) == separable-matmul fast path."""
    from boosting_rcnn_tpu.ops.pallas_roi_align import multilevel_roi_align_pallas

    c = 8
    feats = [
        rng.rand(64, 80, c).astype(np.float32),
        rng.rand(32, 40, c).astype(np.float32),
        rng.rand(16, 20, c).astype(np.float32),
        rng.rand(8, 10, c).astype(np.float32),
        rng.rand(4, 5, c).astype(np.float32),
    ]
    strides = [8, 16, 32, 64, 128]
    n = 12
    ar = rng.rand(n) * 2.0 + 0.5
    sc = rng.rand(n) * 250 + 12
    w = sc * np.sqrt(ar)
    h = sc / np.sqrt(ar)
    x1 = rng.rand(n) * np.clip(640 - w, 1, None)
    y1 = rng.rand(n) * np.clip(512 - h, 1, None)
    rois = np.stack(
        [x1, y1, np.minimum(x1 + w, 639), np.minimum(y1 + h, 511)], -1
    ).astype(np.float32)
    valid = np.ones(n, bool)
    fast = np.asarray(ra.multilevel_roi_align_fast(feats, rois, valid, strides))
    pal = np.asarray(
        multilevel_roi_align_pallas(feats, rois, valid, strides, interpret=True)
    )
    np.testing.assert_allclose(pal, fast, rtol=1e-5, atol=1e-5)


def test_pallas_trainable_gradient_matches_xla(rng):
    """The custom_vjp training wrapper: Pallas forward, backward == the XLA
    fast path's autodiff (feature gradients identical)."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        multilevel_roi_align_pallas_trainable,
    )

    c = 8
    feats = tuple(
        jnp.asarray(rng.rand(h, w, c).astype(np.float32))
        for h, w in ((32, 40), (16, 20), (8, 10))
    )
    strides = [8, 16, 32]
    rois = jnp.asarray(
        [[4.0, 4.0, 60.0, 50.0], [30.0, 20.0, 200.0, 150.0]], jnp.float32
    )
    valid = jnp.ones(2, bool)

    def f_pallas(fs):
        out = multilevel_roi_align_pallas_trainable(
            fs, rois, valid, strides, interpret=True
        )
        return jnp.sum(out**2)

    def f_fast(fs):
        out = ra.multilevel_roi_align_fast(fs, rois, valid, strides)
        return jnp.sum(out**2)

    gp = jax.grad(f_pallas)(feats)
    gf = jax.grad(f_fast)(feats)
    for a, b in zip(gp, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
    assert sum(float(jnp.abs(g).sum()) for g in gp) > 0


def test_generic_roi_extractor_all_levels():
    """GRoIE (reference generic_roi_extractor.py): sum aggregation equals
    the sum of single-level aligns; concat stacks channels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.roi_align import (
        multilevel_roi_align_all,
        roi_align,
    )

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(16 // (2 ** i), 24 // (2 ** i), 4)
                         .astype(np.float32)) for i in range(3)]
    strides = (8, 16, 32)
    rois = jnp.asarray([[8.0, 8.0, 96.0, 96.0]])
    valid = jnp.asarray([True])
    out = multilevel_roi_align_all(feats, rois, valid, strides, out_size=7)
    want = sum(
        roi_align(f, rois, 1.0 / s, out_size=7)
        for f, s in zip(feats, strides)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    cat = multilevel_roi_align_all(feats, rois, valid, strides, out_size=7,
                                   aggregation="concat")
    assert cat.shape[-1] == 12


def test_pallas_bwd_matches_xla_vjp():
    """Round-3 backward kernel: the sequential VMEM-accumulation transpose
    must equal the autodiff of the XLA fast path (same window function)."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        multilevel_roi_align_pallas_bwd,
    )
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(0)
    shapes = [(32, 40), (16, 20), (8, 10), (4, 5)]
    strides = (8, 16, 32, 64)
    c = 32
    feats = tuple(
        jnp.asarray(rs.randn(h, w, c), jnp.float32) for h, w in shapes
    )
    r = 24
    cx = rs.uniform(10, 300, r)
    cy = rs.uniform(10, 240, r)
    bw = rs.uniform(8, 260, r)
    bh = rs.uniform(8, 200, r)
    rois = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    valid = jnp.asarray(rs.rand(r) > 0.2)
    g = jnp.asarray(rs.randn(r, 7, 7, c), jnp.float32)

    _, vjp = jax.vjp(
        lambda ff: multilevel_roi_align_fast(ff, rois, valid, strides), feats
    )
    (ref,) = vjp(g)
    got = multilevel_roi_align_pallas_bwd(
        feats, rois, valid, g, strides, interpret=True
    )
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_pallas_bwd_split_accumulator_path():
    """Force the two-pass (level-0 | rest) accumulator split and check it
    still matches the XLA VJP (the split is what runs at train shapes)."""
    import jax
    import jax.numpy as jnp

    import boosting_rcnn_tpu.ops.pallas_roi_align as pra
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(3)
    shapes = [(40, 48), (20, 24), (10, 12), (5, 6)]
    strides = (8, 16, 32, 64)
    c = 32
    feats = tuple(
        jnp.asarray(rs.randn(h, w, c), jnp.float32) for h, w in shapes
    )
    r = 16
    cx = rs.uniform(10, 360, r)
    cy = rs.uniform(10, 300, r)
    bw = rs.uniform(8, 300, r)
    bh = rs.uniform(8, 260, r)
    rois = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    valid = jnp.ones((r,), bool)
    g = jnp.asarray(rs.randn(r, 7, 7, c), jnp.float32)
    _, vjp = jax.vjp(
        lambda ff: multilevel_roi_align_fast(ff, rois, valid, strides), feats
    )
    (ref,) = vjp(g)

    budget = pra._ACC_BUDGET_BYTES
    pra._ACC_BUDGET_BYTES = 40 * 48 * (32 + 8) * 4 * 2  # forces the split
    try:
        got = pra.multilevel_roi_align_pallas_bwd(
            feats, rois, valid, g, strides, interpret=True
        )
    finally:
        pra._ACC_BUDGET_BYTES = budget
    assert got is not None
    for a, b in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )

def test_pallas_bwd_sorted_pass_empty_and_vmap():
    """Sorted-pass bounds (round-3): an empty pass (every RoI on one side of
    the row split) must still produce exact gradients, and the kernel must
    stay correct under vmap (the train path maps it over the batch)."""
    import jax
    import jax.numpy as jnp

    import boosting_rcnn_tpu.ops.pallas_roi_align as pra
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(7)
    shapes = [(40, 48), (20, 24), (10, 12), (5, 6)]
    strides = (8, 16, 32, 64)
    c = 32
    b, r = 2, 12
    feats = tuple(
        jnp.asarray(rs.randn(b, h, w, c), jnp.float32) for h, w in shapes
    )
    # tiny boxes -> all route to level 0: pass 1 (rest of the pyramid) empty
    cx = rs.uniform(20, 340, (b, r))
    cy = rs.uniform(20, 280, (b, r))
    bw = rs.uniform(8, 24, (b, r))
    bh = rs.uniform(8, 24, (b, r))
    rois = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    valid = jnp.ones((b, r), bool)
    g = jnp.asarray(rs.randn(b, r, 7, 7, c), jnp.float32)

    def ref_one(fs, rb, vb, gb):
        _, vjp = jax.vjp(
            lambda ff: multilevel_roi_align_fast(ff, rb, vb, strides), fs
        )
        (d,) = vjp(gb)
        return d

    ref = jax.vmap(ref_one)(feats, rois, valid, g)

    budget = pra._ACC_BUDGET_BYTES
    pra._ACC_BUDGET_BYTES = 40 * 48 * (32 + 8) * 4 * 2  # forces 2 passes
    try:
        got = jax.vmap(
            lambda fs, rb, vb, gb: pra.multilevel_roi_align_pallas_bwd(
                fs, rb, vb, gb, strides, interpret=True
            )
        )(feats, rois, valid, g)
    finally:
        pra._ACC_BUDGET_BYTES = budget
    assert got is not None
    for a, e in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4
        )

def _batched_case(rs, b=2, r=10, c=128, dtype=np.float32):
    """Shared geometry for the batched (whole-batch flat-R) kernel tests:
    3-level pyramid, mixed roi scales so all levels are exercised, a couple
    of invalid rois."""
    import jax.numpy as jnp

    shapes = [(24, 32), (12, 16), (6, 8)]
    strides = (8, 16, 32)
    feats = tuple(
        jnp.asarray(rs.randn(b, h, w, c), dtype) for h, w in shapes
    )
    cx = rs.uniform(12, 230, (b, r))
    cy = rs.uniform(12, 170, (b, r))
    bw = rs.uniform(8, 180, (b, r))
    bh = rs.uniform(8, 150, (b, r))
    rois = jnp.asarray(
        np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], -1),
        jnp.float32,
    )
    valid = np.ones((b, r), bool)
    valid[:, -2:] = False  # padded tail rois must contribute nothing
    return feats, rois, jnp.asarray(valid), strides


@pytest.mark.slow
def test_batched_pallas_forward_matches_vmapped_fast():
    """Whole-batch single-call kernel (interpret) == vmapped XLA fast path,
    invalid rois zeroed."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        batched_multilevel_roi_align,
    )
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(11)
    feats, rois, valid, strides = _batched_case(rs)
    got = batched_multilevel_roi_align(
        feats, rois, valid, strides, interpret=True
    )
    ref = jax.vmap(
        lambda fl, rb, vb: multilevel_roi_align_fast(fl, rb, vb, strides)
    )(feats, rois, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    assert np.asarray(got)[:, -2:].max() == 0.0  # invalid rois zeroed

    # r < pipeline depth: drain path of the staged-output ring
    f1 = tuple(f[:1] for f in feats)
    got1 = batched_multilevel_roi_align(
        f1, rois[:1, :3], valid[:1, :3], strides, interpret=True
    )
    ref1 = jax.vmap(
        lambda fl, rb, vb: multilevel_roi_align_fast(fl, rb, vb, strides)
    )(f1, rois[:1, :3], valid[:1, :3])
    np.testing.assert_allclose(
        np.asarray(got1), np.asarray(ref1), rtol=1e-5, atol=1e-5
    )


@pytest.mark.slow
def test_batched_pallas_gradient_matches_vmapped_xla():
    """custom_vjp of the batched entry: Pallas backward (per-image passes)
    == autodiff of the vmapped XLA fast path."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        batched_multilevel_roi_align,
    )
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(5)
    feats, rois, valid, strides = _batched_case(rs, r=8)

    def f_pallas(fs):
        out = batched_multilevel_roi_align(
            fs, rois, valid, strides, interpret=True
        )
        return jnp.sum(out ** 2)

    def f_fast(fs):
        out = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(fl, rb, vb, strides)
        )(fs, rois, valid)
        return jnp.sum(out ** 2)

    gp = jax.grad(f_pallas)(feats)
    gf = jax.grad(f_fast)(feats)
    for a, e in zip(gp, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4
        )
    assert sum(float(jnp.abs(x).sum()) for x in gp) > 0


def test_batched_pallas_gradient_split_passes():
    """Small accumulator budget -> two passes per image (the train-geometry
    configuration); gradients must stay exact."""
    import jax
    import jax.numpy as jnp

    import boosting_rcnn_tpu.ops.pallas_roi_align as pra
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(17)
    feats, rois, valid, strides = _batched_case(rs, r=8)

    def f_pallas(fs):
        out = pra.batched_multilevel_roi_align(
            fs, rois, valid, strides, interpret=True
        )
        return jnp.sum(out ** 2)

    def f_fast(fs):
        out = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(fl, rb, vb, strides)
        )(fs, rois, valid)
        return jnp.sum(out ** 2)

    budget = pra._ACC_BUDGET_BYTES
    # rows_img = 24+12+6+24 = 66, pad_w = 40: whole image needs 66*40*128*4
    # = 1.29 MB; the h0|rest split needs max(24, 42) rows = 0.82 MB
    pra._ACC_BUDGET_BYTES = 1 * 2 ** 20
    try:
        gp = jax.grad(f_pallas)(feats)
    finally:
        pra._ACC_BUDGET_BYTES = budget
    gf = jax.grad(f_fast)(feats)
    for a, e in zip(gp, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4
        )


def test_batched_entry_unaligned_channels_fallback():
    """C % 128 != 0 (dev models) must silently take the vmapped XLA path —
    same values, gradient intact."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        batched_multilevel_roi_align,
    )
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(23)
    feats, rois, valid, strides = _batched_case(rs, r=6, c=16)
    got = batched_multilevel_roi_align(
        feats, rois, valid, strides, interpret=True
    )
    ref = jax.vmap(
        lambda fl, rb, vb: multilevel_roi_align_fast(fl, rb, vb, strides)
    )(feats, rois, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    g = jax.grad(
        lambda fs: jnp.sum(
            batched_multilevel_roi_align(
                fs, rois, valid, strides, interpret=True
            ) ** 2
        )
    )(feats)
    assert sum(float(jnp.abs(x).sum()) for x in g) > 0


@pytest.mark.slow
def test_batched_pallas_mask_geometry_14x14():
    """Mask-branch geometry (out_size=14 -> staging pad 16): forward and
    gradient parity vs the vmapped XLA path."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.ops.pallas_roi_align import (
        batched_multilevel_roi_align,
    )
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    rs = np.random.RandomState(31)
    feats, rois, valid, strides = _batched_case(rs, r=5)
    got = batched_multilevel_roi_align(
        feats, rois, valid, strides, out_size=14, interpret=True
    )
    ref = jax.vmap(
        lambda fl, rb, vb: multilevel_roi_align_fast(
            fl, rb, vb, strides, out_size=14)
    )(feats, rois, valid)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
    gp = jax.grad(
        lambda fs: jnp.sum(
            batched_multilevel_roi_align(
                fs, rois, valid, strides, out_size=14, interpret=True
            ) ** 2
        )
    )(feats)
    gf = jax.grad(
        lambda fs: jnp.sum(
            jax.vmap(
                lambda fl, rb, vb: multilevel_roi_align_fast(
                    fl, rb, vb, strides, out_size=14)
            )(fs, rois, valid) ** 2
        )
    )(feats)
    for a, e in zip(gp, gf):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(e), rtol=1e-4, atol=1e-4
        )
