"""Anchor generation.

TPU-native design: anchors depend only on the (static) padded canvas shape, so
they are generated once on the host with numpy and baked into the jitted step
as constants.  All levels are returned both per-level and as one flat
``(sum_l H_l*W_l*A, 4)`` tensor so downstream target assignment is a single
fixed-shape computation instead of the reference's per-level python loop.

Reference semantics: mmdet ``mmdet/core/anchor/anchor_generator.py``
(``gen_single_level_base_anchors:131``, ``grid_anchors:309``,
``valid_flags:383``) and ``mmdet/core/anchor/utils.py:21``
(``anchor_inside_flags``).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["AnchorGenerator", "anchor_inside_flags"]


class AnchorGenerator:
    """Standard 2D anchor generator (numpy, host side).

    Args mirror the reference config surface:
        strides: per-level stride (int or (w, h) pair).
        ratios: h/w ratios.
        scales: explicit scales, or use ``octave_base_scale`` +
            ``scales_per_octave`` (RetinaNet-style octave scales).
        base_sizes: defaults to strides.
        center_offset: center shift in units of stride (0 in mmdet v2).
    """

    def __init__(
        self,
        strides: Sequence,
        ratios: Sequence[float],
        scales: Optional[Sequence[float]] = None,
        base_sizes: Optional[Sequence[int]] = None,
        scale_major: bool = True,
        octave_base_scale: Optional[int] = None,
        scales_per_octave: Optional[int] = None,
        centers: Optional[Sequence[Tuple[float, float]]] = None,
        center_offset: float = 0.0,
    ):
        self.strides = [s if isinstance(s, (tuple, list)) else (s, s) for s in strides]
        self.base_sizes = (
            [min(s) for s in self.strides] if base_sizes is None else list(base_sizes)
        )
        assert (octave_base_scale is not None and scales_per_octave is not None) ^ (
            scales is not None
        )
        if scales is not None:
            self.scales = np.asarray(scales, dtype=np.float32)
        else:
            octave_scales = np.array(
                [2 ** (i / scales_per_octave) for i in range(scales_per_octave)]
            )
            self.scales = (octave_scales * octave_base_scale).astype(np.float32)
        self.ratios = np.asarray(ratios, dtype=np.float32)
        self.scale_major = scale_major
        self.centers = centers
        self.center_offset = center_offset
        self.base_anchors = [
            self._single_level_base_anchors(
                base_size, centers[i] if centers is not None else None
            )
            for i, base_size in enumerate(self.base_sizes)
        ]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _single_level_base_anchors(self, base_size, center=None) -> np.ndarray:
        w = h = float(base_size)
        if center is None:
            x_center = self.center_offset * w
            y_center = self.center_offset * h
        else:
            x_center, y_center = center
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        return np.stack(
            [
                x_center - 0.5 * ws,
                y_center - 0.5 * hs,
                x_center + 0.5 * ws,
                y_center + 0.5 * hs,
            ],
            axis=-1,
        ).astype(np.float32)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> List[np.ndarray]:
        """Per-level anchors ``(H*W*A, 4)`` for static featmap sizes."""
        assert len(featmap_sizes) == self.num_levels
        out = []
        for lvl, (feat_h, feat_w) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            shift_x = np.arange(feat_w, dtype=np.float32) * sw
            shift_y = np.arange(feat_h, dtype=np.float32) * sh
            xx = np.tile(shift_x, feat_h)
            yy = np.repeat(shift_y, feat_w)
            shifts = np.stack([xx, yy, xx, yy], axis=-1)  # (H*W, 4)
            anchors = (
                shifts[:, None, :] + self.base_anchors[lvl][None, :, :]
            ).reshape(-1, 4)
            out.append(anchors.astype(np.float32))
        return out

    def flat_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]) -> np.ndarray:
        """All-level anchors concatenated to one ``(A_total, 4)`` array."""
        return np.concatenate(self.grid_anchors(featmap_sizes), axis=0)

    def level_ids(self, featmap_sizes: Sequence[Tuple[int, int]]) -> np.ndarray:
        """Level index per flat anchor, ``(A_total,)`` int32."""
        per = self.grid_anchors(featmap_sizes)
        return np.concatenate(
            [np.full((a.shape[0],), i, dtype=np.int32) for i, a in enumerate(per)]
        )

    def valid_flags(
        self,
        featmap_sizes: Sequence[Tuple[int, int]],
        pad_shape: Tuple[int, int],
    ) -> np.ndarray:
        """Flat validity mask for anchors whose grid cell lies inside the
        (unpadded) valid region of the canvas.  ``pad_shape`` = (H, W) of the
        actual image content inside the padded canvas.

        NOTE: unlike the reference this is static only if pad_shape is
        static; for per-image dynamic valid regions use
        ``dynamic_valid_flags`` below inside jit.
        """
        h, w = pad_shape
        flags = []
        for lvl, (feat_h, feat_w) in enumerate(featmap_sizes):
            sw, sh = self.strides[lvl]
            valid_w = min(int(np.ceil(w / sw)), feat_w)
            valid_h = min(int(np.ceil(h / sh)), feat_h)
            vx = np.zeros(feat_w, dtype=bool)
            vx[:valid_w] = True
            vy = np.zeros(feat_h, dtype=bool)
            vy[:valid_h] = True
            vv = (vy[:, None] & vx[None, :]).reshape(-1)
            flags.append(np.repeat(vv, self.num_base_anchors[lvl]))
        return np.concatenate(flags)


def anchor_inside_flags(flat_anchors, valid_flags, img_shape, allowed_border=0):
    """Mask of anchors inside ``img_shape`` (traced ``(2,)`` array ok).

    With ``allowed_border < 0`` (the shipping config) every valid anchor
    passes — mirrors ``core/anchor/utils.py:21``.
    """
    import jax.numpy as jnp

    if allowed_border >= 0:
        img_h = img_shape[0].astype(flat_anchors.dtype)
        img_w = img_shape[1].astype(flat_anchors.dtype)
        inside = (
            (flat_anchors[:, 0] >= -allowed_border)
            & (flat_anchors[:, 1] >= -allowed_border)
            & (flat_anchors[:, 2] < img_w + allowed_border)
            & (flat_anchors[:, 3] < img_h + allowed_border)
        )
        return jnp.logical_and(valid_flags, inside)
    return valid_flags
