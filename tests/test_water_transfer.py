"""Underwater style transfer tool (tools/misc/water_transfer.py) — the
checkpoint-free equivalent of the fork's WaterTransfer/CBST trio."""
import importlib.util
import os
import sys

import numpy as np
import pytest

spec = importlib.util.spec_from_file_location(
    "water_transfer",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "misc", "water_transfer.py"))
wt = importlib.util.module_from_spec(spec)
spec.loader.exec_module(wt)


def _imgs():
    rs = np.random.RandomState(0)
    content = rs.rand(32, 48, 3) * 0.8 + 0.1
    # a blue-green "water" cast
    style = rs.rand(24, 24, 3) * np.array([0.2, 0.6, 0.8]) + np.array(
        [0.0, 0.2, 0.2])
    return content, style


def test_reinhard_matches_lab_stats():
    content, style = _imgs()
    out = wt.reinhard_transfer(content, style)
    lo, ls = wt._rgb_to_lab(out), wt._rgb_to_lab(style)
    np.testing.assert_allclose(lo.mean((0, 1)), ls.mean((0, 1)), atol=0.05)
    np.testing.assert_allclose(lo.std((0, 1)), ls.std((0, 1)), atol=0.05)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_lab_roundtrip():
    content, _ = _imgs()
    rt = wt._lab_to_rgb(wt._rgb_to_lab(content))
    np.testing.assert_allclose(rt, content, atol=1e-6)


def test_hist_match_matches_distribution():
    content, style = _imgs()
    out = wt.hist_match(content, style)
    for ch in range(3):
        # matched channel has (almost) the style's quantiles
        q = np.percentile(out[..., ch], [10, 50, 90])
        qs = np.percentile(style[..., ch], [10, 50, 90])
        np.testing.assert_allclose(q, qs, atol=0.03)


def test_blend_strength_in_range():
    content, style = _imgs()
    rng = np.random.RandomState(3)
    out = wt.stylize(content, style, "reinhard", rng=rng, alpha=2.0)
    assert out.shape == content.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_cli_roundtrip(tmp_path):
    cv2 = pytest.importorskip("cv2")
    cdir, sdir, odir = tmp_path / "c", tmp_path / "s", tmp_path / "o"
    cdir.mkdir(), sdir.mkdir()
    rs = np.random.RandomState(1)
    cv2.imwrite(str(cdir / "a.png"),
                (rs.rand(20, 30, 3) * 255).astype(np.uint8))
    cv2.imwrite(str(sdir / "type1.png"),
                (rs.rand(16, 16, 3) * 255).astype(np.uint8))
    argv = sys.argv
    sys.argv = ["water_transfer", str(cdir), str(sdir), str(odir)]
    try:
        wt.main()
    finally:
        sys.argv = argv
    assert (odir / "a.png").exists()
    out = cv2.imread(str(odir / "a.png"))
    assert out.shape == (20, 30, 3)
