"""Native C++ preprocessing parity vs the cv2 reference path."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from native import get_lib, native_preprocess

MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


@pytest.mark.skipif(get_lib() is None, reason="toolchain unavailable")
@pytest.mark.parametrize("flip", [False, True])
def test_native_matches_cv2(rng, flip):
    img = (rng.rand(123, 217, 3) * 255).astype(np.uint8)
    canvas = (96, 160)
    nh, nw = 91, 153
    got = native_preprocess(img, canvas, nh, nw, MEAN, STD, to_rgb=True, flip=flip)
    assert got is not None and got.shape == (*canvas, 3)

    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    resized = resized[..., ::-1]
    if flip:
        resized = resized[:, ::-1]
    exp = np.zeros((*canvas, 3), np.float32)
    exp[:nh, :nw] = (resized.astype(np.float32) - MEAN) / STD
    # cv2 INTER_LINEAR uses fixed-point arithmetic; allow small tolerance
    np.testing.assert_allclose(got, exp, atol=0.05)
    # padding region must be exactly zero
    assert (got[nh:] == 0).all() and (got[:, nw:] == 0).all()


@pytest.mark.skipif(get_lib() is None, reason="toolchain unavailable")
def test_native_identity_resize(rng):
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    got = native_preprocess(img, (32, 32), 32, 32, MEAN, STD, to_rgb=False)
    exp = (img.astype(np.float32) - MEAN) / STD
    np.testing.assert_allclose(got, exp, atol=1e-3)
