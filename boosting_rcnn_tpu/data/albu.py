"""Native implementations of the albumentations transforms the reference
config zoo requests.

The reference's ``Albu`` pipeline op (reference ``pipelines/transforms.py:
1321``) wraps the third-party ``albumentations`` package, which is not
available in this environment; instead of an import-gated raise, the subset
actually used by the shipped configs (``configs/albu_example/
mask_rcnn_r50_fpn_albu_1x_coco.py``) is implemented here with
albumentations' sampling semantics:

  ShiftScaleRotate, RandomBrightnessContrast, RGBShift,
  HueSaturationValue, JpegCompression, ChannelShuffle, Blur, MedianBlur,
  and the OneOf composition.

Geometry: ShiftScaleRotate warps the image with reflect-101 borders
(albumentations' default border_mode) and transforms boxes by mapping the
four corners through the affine matrix; polygon segmentations are
transformed point-exactly, RLE/crowd masks are decoded, warped with
nearest-neighbour and handed downstream as full-image bitmaps
(``pipeline.preprocess`` accepts ndarray segmentations).  Boxes whose
clipped visible fraction drops below ``min_visibility`` are dropped
(albumentations BboxParams(filter_lost_elements=True) semantics).

Unknown transform types raise (repo convention: no silent no-ops).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

PIXEL_TYPES = (
    "RandomBrightnessContrast", "RGBShift", "HueSaturationValue",
    "JpegCompression", "ChannelShuffle", "Blur", "MedianBlur",
)
GEOM_TYPES = ("ShiftScaleRotate",)
SUPPORTED = PIXEL_TYPES + GEOM_TYPES + ("OneOf",)


def _u(rng: np.random.RandomState, lim, center=0.0) -> float:
    """albumentations limit sampling: scalar lim -> U(center-lim,
    center+lim); [lo, hi] -> U(center+lo, center+hi)."""
    if isinstance(lim, (list, tuple)):
        lo, hi = float(lim[0]), float(lim[1])
    else:
        lo, hi = -float(lim), float(lim)
    return float(rng.uniform(center + lo, center + hi))


def _brightness_contrast(img, t, rng):
    alpha = 1.0 + _u(rng, t.get("contrast_limit", 0.2))
    beta = _u(rng, t.get("brightness_limit", 0.2))
    # brightness_by_max=True (albumentations default): beta scales 255
    x = img.astype(np.float32) * alpha + beta * 255.0
    return np.clip(x, 0, 255).astype(img.dtype)


def _rgb_shift(img, t, rng):
    shifts = [
        _u(rng, t.get("r_shift_limit", 20)),
        _u(rng, t.get("g_shift_limit", 20)),
        _u(rng, t.get("b_shift_limit", 20)),
    ]
    x = img.astype(np.float32) + np.asarray(shifts, np.float32)
    return np.clip(x, 0, 255).astype(img.dtype)


def _hsv(img, t, rng):
    if cv2 is None:
        return img
    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
    hsv[..., 0] = (hsv[..., 0] + int(_u(rng, t.get("hue_shift_limit", 20)))) % 180
    hsv[..., 1] = np.clip(
        hsv[..., 1] + int(_u(rng, t.get("sat_shift_limit", 30))), 0, 255)
    hsv[..., 2] = np.clip(
        hsv[..., 2] + int(_u(rng, t.get("val_shift_limit", 20))), 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def _jpeg(img, t, rng):
    if cv2 is None:
        return img
    q = int(rng.randint(int(t.get("quality_lower", 99)),
                        int(t.get("quality_upper", 100)) + 1))
    ok, buf = cv2.imencode(
        ".jpg", img[..., ::-1], [int(cv2.IMWRITE_JPEG_QUALITY), q])
    if not ok:
        return img
    return cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]


def _channel_shuffle(img, t, rng):
    return img[..., rng.permutation(img.shape[-1])]


def _blur(img, t, rng, median=False):
    if cv2 is None:
        return img
    lim = int(t.get("blur_limit", 7))
    sizes = [k for k in range(3, max(lim, 3) + 1, 2)]
    k = int(sizes[rng.randint(0, len(sizes))])
    if median:
        return cv2.medianBlur(img, k)
    return cv2.blur(img, (k, k))


def _shift_scale_rotate(img, bboxes, segs, t, rng):
    h, w = img.shape[:2]
    angle = _u(rng, t.get("rotate_limit", 45))
    scale = 1.0 + _u(rng, t.get("scale_limit", 0.1))
    dx = _u(rng, t.get("shift_limit", 0.0625))
    dy = _u(rng, t.get("shift_limit", 0.0625))
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle, scale)
    m[0, 2] += dx * w
    m[1, 2] += dy * h
    out = cv2.warpAffine(
        img, m, (w, h), flags=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )

    def warp_pts(pts):  # (N, 2)
        return pts @ m[:, :2].T + m[:, 2]

    new_boxes = bboxes.copy().astype(np.float32)
    vis = np.ones(len(bboxes), np.float32)
    if len(bboxes):
        x1, y1, x2, y2 = [bboxes[:, i] for i in range(4)]
        corners = np.stack(
            [np.stack([x1, y1], -1), np.stack([x2, y1], -1),
             np.stack([x2, y2], -1), np.stack([x1, y2], -1)], axis=1
        )  # (N, 4, 2)
        wc = warp_pts(corners.reshape(-1, 2)).reshape(-1, 4, 2)
        nb = np.concatenate([wc.min(1), wc.max(1)], axis=1)
        clipped = nb.copy()
        clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
        clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
        full = np.maximum(nb[:, 2] - nb[:, 0], 1e-6) * np.maximum(
            nb[:, 3] - nb[:, 1], 1e-6)
        visible = np.maximum(clipped[:, 2] - clipped[:, 0], 0) * np.maximum(
            clipped[:, 3] - clipped[:, 1], 0)
        vis = visible / full
        new_boxes = clipped
    new_segs = None
    if segs is not None:
        new_segs = []
        for seg in segs:
            if seg is None:
                new_segs.append(None)
            elif isinstance(seg, np.ndarray) and seg.ndim == 2:
                new_segs.append(cv2.warpAffine(
                    seg, m, (w, h), flags=cv2.INTER_NEAREST))
            elif isinstance(seg, dict):
                from .mask_utils import MASK_CROP_SIZE  # noqa: F401
                # uncompressed RLE -> bitmap -> warp (rare: crowd anns)
                counts, (rh, rw) = seg["counts"], seg["size"]
                flat = np.zeros(rh * rw, np.uint8)
                pos, val = 0, 0
                for c in counts:
                    flat[pos:pos + c] = val
                    pos += c
                    val = 1 - val
                bmp = flat.reshape(rw, rh).T
                new_segs.append(cv2.warpAffine(
                    bmp, m, (w, h), flags=cv2.INTER_NEAREST))
            else:  # polygon list: transform the points exactly
                new_segs.append([
                    warp_pts(np.asarray(p, np.float64).reshape(-1, 2))
                    .reshape(-1) for p in seg
                ])
    return out, new_boxes, new_segs, vis


def _apply_one(img, bboxes, segs, t, rng):
    """Apply a single transform dict; returns (img, bboxes, segs, vis)."""
    tt = t["type"]
    if tt == "ShiftScaleRotate":
        return _shift_scale_rotate(img, bboxes, segs, t, rng)
    if tt == "RandomBrightnessContrast":
        img = _brightness_contrast(img, t, rng)
    elif tt == "RGBShift":
        img = _rgb_shift(img, t, rng)
    elif tt == "HueSaturationValue":
        img = _hsv(img, t, rng)
    elif tt == "JpegCompression":
        img = _jpeg(img, t, rng)
    elif tt == "ChannelShuffle":
        img = _channel_shuffle(img, t, rng)
    elif tt == "Blur":
        img = _blur(img, t, rng)
    elif tt == "MedianBlur":
        img = _blur(img, t, rng, median=True)
    else:
        raise NotImplementedError(
            f"albu transform '{tt}' is not implemented natively "
            f"(supported: {SUPPORTED})"
        )
    return img, bboxes, segs, np.ones(len(bboxes), np.float32)


def apply_albu(
    img: np.ndarray,
    bboxes: np.ndarray,  # (N, 4) xyxy
    labels: np.ndarray,  # (N,)
    segs: Optional[list],
    transforms: Sequence[dict],
    rng: np.random.RandomState,
    min_visibility: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[list]]:
    """Run an albumentations-style transform list (each entry fires with
    its own ``p``; ``OneOf`` picks one child by normalised child
    probability).  Boxes are filtered by ``min_visibility`` afterwards."""
    vis_all = np.ones(len(bboxes), np.float32)
    for t in transforms:
        tt = t["type"]
        p = float(t.get("p", 0.5))
        if rng.rand() >= p:
            continue
        if tt == "OneOf":
            children = t.get("transforms", [])
            if not children:
                continue
            cps = np.asarray([float(c.get("p", 1.0)) for c in children])
            cps = cps / max(cps.sum(), 1e-12)
            pick = children[int(rng.choice(len(children), p=cps))]
            img, bboxes, segs, vis = _apply_one(img, bboxes, segs, pick, rng)
        else:
            img, bboxes, segs, vis = _apply_one(img, bboxes, segs, t, rng)
        vis_all = np.minimum(vis_all, vis)
    if len(bboxes):
        keep = (vis_all > max(min_visibility, 1e-6)) & (
            (bboxes[:, 2] - bboxes[:, 0]) > 1e-3) & (
            (bboxes[:, 3] - bboxes[:, 1]) > 1e-3)
        if not keep.all():
            bboxes = bboxes[keep]
            labels = labels[keep]
            if segs is not None:
                segs = [s for s, k in zip(segs, keep) if k]
    return np.ascontiguousarray(img), bboxes, labels, segs
