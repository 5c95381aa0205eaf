"""Gaussian heatmap target ops."""
import numpy as np
import jax.numpy as jnp

from boosting_rcnn_tpu.ops.gaussian_target import (
    gaussian_radius,
    gen_gaussian_target,
)


def test_radius_monotonic_in_overlap():
    r_lo = float(gaussian_radius((24.0, 24.0), 0.5))
    r_hi = float(gaussian_radius((24.0, 24.0), 0.9))
    assert r_hi < r_lo
    assert r_hi > 0


def test_stamp_and_mask():
    hm = jnp.zeros((32, 32))
    centers = jnp.asarray([[16.0, 16.0], [5.0, 5.0], [0.0, 0.0]])
    radii = jnp.asarray([4.0, 2.0, -1.0])
    out = np.asarray(gen_gaussian_target(hm, centers, radii))
    assert abs(out[16, 16] - 1.0) < 1e-5
    assert abs(out[5, 5] - 1.0) < 1e-5
    assert out[0, 0] < 0.1  # masked (negative radius) instance
    # max-combine: overlapping bumps don't sum above 1
    assert out.max() <= 1.0 + 1e-6


def test_corner_pool_golden():
    """CornerPool (reference mmcv corner_pool): directional running maxima."""
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.corner_pool import (
        bottom_pool,
        left_pool,
        right_pool,
        top_pool,
    )

    x = jnp.asarray(
        np.array([[1, 0, 2], [0, 3, 0], [4, 0, 0]], np.float32)
    )[..., None]
    tp = np.asarray(top_pool(x))[..., 0]
    np.testing.assert_allclose(tp, [[4, 3, 2], [4, 3, 0], [4, 0, 0]])
    bp = np.asarray(bottom_pool(x))[..., 0]
    np.testing.assert_allclose(bp, [[1, 0, 2], [1, 3, 2], [4, 3, 2]])
    lp = np.asarray(left_pool(x))[..., 0]
    np.testing.assert_allclose(lp, [[2, 2, 2], [3, 3, 0], [4, 0, 0]])
    rp = np.asarray(right_pool(x))[..., 0]
    np.testing.assert_allclose(rp, [[1, 1, 2], [0, 3, 3], [4, 4, 4]])
