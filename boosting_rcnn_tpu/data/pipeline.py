"""Host-side preprocessing pipeline -> fixed-shape padded batches.

Replaces the reference's mmcv pipeline ops (``mmdet/datasets/pipelines/
transforms.py``: ``Resize:30`` keep-ratio, ``RandomFlip:323``, ``Pad:570``,
``Normalize:669``; ``formating.py`` ``Collect``) with one fused numpy
function producing the static canvas the jitted model consumes.  The
``img_metas`` dict the reference carries becomes explicit arrays:
``img_shape`` (resized H, W) and ``scale_factor`` (w_s, h_s, w_s, h_s).

Multi-scale train jitter (``mstrain`` configs: Resize img_scale value-mode
range 480..800) is supported by sampling the short side per image while
keeping the padded canvas fixed — XLA still compiles once.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

DEFAULT_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
DEFAULT_STD = np.array([58.395, 57.12, 57.375], np.float32)


def rescale_size(w: int, h: int, scale: Tuple[int, int]) -> Tuple[int, int, float]:
    """Keep-ratio target size for max-side/min-side ``scale`` (mmcv
    ``rescale_size`` semantics: factor = min(long/max(w,h), short/min(w,h)))."""
    long_side, short_side = max(scale), min(scale)
    f = min(long_side / max(w, h), short_side / min(w, h))
    return int(w * f + 0.5), int(h * f + 0.5), f


def load_image(path: str) -> np.ndarray:
    if cv2 is None:
        raise RuntimeError("cv2 unavailable")
    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR
    if img is None:
        raise FileNotFoundError(path)
    return img


def preprocess(
    img: np.ndarray,  # (H, W, 3) BGR uint8
    bboxes: np.ndarray,  # (N, 4) xyxy
    labels: np.ndarray,  # (N,)
    canvas: Tuple[int, int],  # (H, W) padded canvas
    scale: Tuple[int, int] = (1333, 800),
    flip: bool = False,
    max_gt: int = 100,
    mean: np.ndarray = DEFAULT_MEAN,
    std: np.ndarray = DEFAULT_STD,
    to_rgb: bool = True,
    short_side_override: Optional[int] = None,
    segmentations: Optional[list] = None,
    mask_crop_size: Optional[int] = None,
    semantic_map: Optional[np.ndarray] = None,
    semantic_stride: int = 8,
) -> Dict[str, np.ndarray]:
    h0, w0 = img.shape[:2]
    sc = (max(scale), short_side_override) if short_side_override else scale
    nw, nh, f = rescale_size(w0, h0, sc)
    if nh > canvas[0] or nw > canvas[1]:
        # cap the scale factor so the resized image fits the canvas while
        # preserving aspect ratio (portrait image on a landscape canvas)
        f = min(f * canvas[0] / max(nh, 1), f * canvas[1] / max(nw, 1), f)
        nw, nh = int(w0 * f + 0.5), int(h0 * f + 0.5)
        nw, nh = min(nw, canvas[1]), min(nh, canvas[0])

    # Native fused path (C++ resize+flip+normalize+pad); cv2 fallback.
    out = None
    if img.dtype == np.uint8:
        try:
            from native import native_preprocess

            out = native_preprocess(
                img, canvas, nh, nw, mean, std, to_rgb=to_rgb, flip=flip
            )
        except ImportError:
            out = None
    if out is None:
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if to_rgb:
            resized = resized[..., ::-1]
        if flip:
            resized = resized[:, ::-1]
        out = np.zeros((*canvas, 3), np.float32)
        out[:nh, :nw] = (resized.astype(np.float32) - mean) / std

    # boxes
    w_scale = nw / w0
    h_scale = nh / h0
    b = bboxes.copy().astype(np.float32)
    if len(b):
        b[:, [0, 2]] *= w_scale
        b[:, [1, 3]] *= h_scale
        if flip:
            b2 = b.copy()
            b2[:, 0] = nw - b[:, 2]
            b2[:, 2] = nw - b[:, 0]
            b = b2
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, nw)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, nh)

    n = min(len(b), max_gt)
    gt_bboxes = np.zeros((max_gt, 4), np.float32)
    gt_labels = np.zeros((max_gt,), np.int32)
    gt_mask = np.zeros((max_gt,), bool)
    gt_bboxes[:n] = b[:n]
    gt_labels[:n] = labels[:n]
    gt_mask[:n] = True

    extra = {}
    if semantic_map is not None:
        # Stuff/semantic raster: nearest resize with the image scale, flip,
        # pad with 255 (ignore), then rescale to 1/``semantic_stride`` of the
        # canvas — the reference's LoadAnnotations(with_seg=True) -> Resize
        # (nearest) -> Pad(255) -> SegRescale(1/8) chain
        # (``mmdet/datasets/pipelines/loading.py:378``,
        # ``transforms.py:694`` SegRescale), emitted as a fixed-shape
        # padded array for the TPU batch.
        sem = semantic_map
        if sem.dtype != np.uint8:
            sem = np.clip(sem, 0, 255).astype(np.uint8)
        sem_r = cv2.resize(sem, (nw, nh), interpolation=cv2.INTER_NEAREST)
        if flip:
            sem_r = sem_r[:, ::-1]
        sem_canvas = np.full(canvas, 255, np.uint8)
        sem_canvas[:nh, :nw] = sem_r
        st = semantic_stride
        sh = (canvas[0] + st - 1) // st
        sw = (canvas[1] + st - 1) // st
        extra["gt_semantic_seg"] = cv2.resize(
            sem_canvas, (sw, sh), interpolation=cv2.INTER_NEAREST
        ).astype(np.int32)
    if segmentations is not None:
        from .mask_utils import MASK_CROP_SIZE, polygons_to_box_crop, rle_to_box_crop

        s = mask_crop_size or MASK_CROP_SIZE
        crops = np.zeros((max_gt, s, s), np.uint8)
        for i in range(n):
            seg = segmentations[i]
            if seg is None:
                continue
            # box-relative crops are scale-invariant: rasterise in ORIGINAL
            # image coords against the original box, flip the crop if the
            # image was flipped
            if isinstance(seg, dict):
                crops[i] = rle_to_box_crop(seg, bboxes[i], h0, w0, s)
            elif isinstance(seg, np.ndarray) and seg.ndim == 2:
                # full-image bitmap (e.g. an albu-warped RLE instance):
                # crop the box region and resize, as the RLE path does
                x1, y1, x2, y2 = [int(round(v)) for v in bboxes[i]]
                x2, y2 = max(x2, x1 + 1), max(y2, y1 + 1)
                region = seg[max(y1, 0):y2, max(x1, 0):x2]
                if cv2 is not None and region.size:
                    crops[i] = cv2.resize(
                        region.astype(np.uint8), (s, s),
                        interpolation=cv2.INTER_NEAREST)
            else:
                crops[i] = polygons_to_box_crop(seg, bboxes[i], s)
            if flip:
                crops[i] = crops[i][:, ::-1]
        extra["gt_mask_crops"] = crops

    return dict(
        **extra,
        images=out,
        gt_bboxes=gt_bboxes,
        gt_labels=gt_labels,
        gt_mask=gt_mask,
        img_shape=np.array([nh, nw], np.float32),
        scale_factor=np.array([w_scale, h_scale, w_scale, h_scale], np.float32),
        ori_shape=np.array([h0, w0], np.int32),
    )


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}
