"""Gaussian heatmap targets (reference ``mmdet/models/utils/
gaussian_target.py``: ``gaussian_radius``, ``gen_gaussian_target`` — used by
CenterNet/CornerNet-family heads)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gaussian_radius", "gen_gaussian_target", "gaussian2d"]


def gaussian_radius(det_size, min_overlap: float = 0.7):
    """Minimum radius keeping IoU >= min_overlap for a (h, w) box under the
    three corner-shift cases (CornerNet derivation)."""
    h, w = det_size
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(jnp.maximum(b1**2 - 4 * a1 * c1, 0.0))
    r1 = (b1 - sq1) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    sq2 = jnp.sqrt(jnp.maximum(b2**2 - 4 * a2 * c2, 0.0))
    r2 = (b2 - sq2) / (2 * a2)

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    sq3 = jnp.sqrt(jnp.maximum(b3**2 - 4 * a3 * c3, 0.0))
    r3 = (b3 + sq3) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def gaussian2d(shape_hw, sigma_x, sigma_y, cx, cy):
    """Dense 2-D gaussian bump centered at (cx, cy) over a fixed grid —
    the fixed-shape form of the reference's dynamic patch stamping."""
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return jnp.exp(
        -(((xs - cx) ** 2) / (2 * sigma_x**2) + ((ys - cy) ** 2) / (2 * sigma_y**2))
    )


def gen_gaussian_target(heatmap: jnp.ndarray, centers, radii):
    """Stamp max-combined gaussians for all (padded) instances.

    heatmap: (H, W); centers: (G, 2) float (x, y); radii: (G,) — padded
    instances pass radius 0 (their bump contributes ~a point; mask upstream
    by setting radius < 0 to skip entirely).
    """
    h, w = heatmap.shape

    def one(hm, args):
        c, r = args
        sigma = jnp.maximum((2 * r + 1) / 6.0, 1e-3)
        bump = gaussian2d((h, w), sigma, sigma, c[0], c[1])
        bump = jnp.where(r > 0, bump, 0.0)
        return jnp.maximum(hm, bump), None

    out, _ = jax.lax.scan(one, heatmap, (centers, radii))
    return out
