"""High-level python API (reference surface: ``mmdet/apis`` —
``init_detector``/``inference_detector`` at ``apis/inference.py:17,90``,
``train_detector`` at ``apis/train.py:38``, test loops at ``apis/test.py``).
"""
from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "init_detector",
    "inference_detector",
    "set_random_seed",
]


class DetectorHandle:
    """A built detector + its variables + static geometry, ready for
    single/batch image inference."""

    def __init__(self, detector, variables, canvas, classes):
        import jax

        self.detector = detector
        self.variables = variables
        self.canvas = canvas
        self.classes = classes
        anchors, nla = detector.anchors_for(canvas)
        self.anchors = anchors
        self.num_level_anchors = nla
        self._predict = jax.jit(
            lambda v, b: detector.predict(v, b, self.anchors, nla, rescale=True)
        )


def set_random_seed(seed: int, deterministic: bool = False):
    """Seed numpy + return a jax PRNGKey (jax is deterministic by design —
    the reference's cudnn.deterministic knob has no TPU analog)."""
    import jax

    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def init_detector(
    config: Union[str, Any],
    checkpoint: Optional[str] = None,
    canvas: Tuple[int, int] = (800, 1344),
    dtype=None,
) -> DetectorHandle:
    """Build a detector from a config file (+ optional checkpoint)."""
    import jax
    import jax.numpy as jnp

    from .builder import build_detector
    from .config import Config, load_config

    cfg = load_config(config) if isinstance(config, str) else config
    if dtype is None:
        dtype = (
            jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else jnp.float32
        )
    det = build_detector(cfg.model.to_dict(), dtype=dtype)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    if checkpoint:
        from .engine.checkpoint import load_params

        params, batch_stats = load_params(checkpoint)
        variables = {"params": params, "batch_stats": batch_stats}
    classes = None
    data = cfg.get("data")
    if data:
        classes = data.get("test", {}).get("classes")
    return DetectorHandle(det, variables, canvas, classes)


def inference_detector(
    handle: DetectorHandle,
    imgs: Union[str, np.ndarray, Sequence],
    score_thr: float = 0.0,
):
    """Run inference on image path(s) / array(s).

    Returns per image a list of per-class ``(n, 5)`` arrays like the
    reference's ``bbox2result`` output (``core/bbox/transforms.py:100``).
    """
    import jax.numpy as jnp

    from .data.pipeline import load_image, preprocess

    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    samples = []
    for img in imgs:
        if isinstance(img, str):
            img = load_image(img)
        samples.append(
            preprocess(
                img,
                np.zeros((0, 4), np.float32),
                np.zeros((0,), np.int64),
                canvas=handle.canvas,
            )
        )
    from .data.pipeline import collate

    batch = collate(samples)
    batch.pop("ori_shape")
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    dets, labels, valid = handle._predict(handle.variables, jb)
    dets, labels, valid = map(np.asarray, (dets, labels, valid))

    num_classes = (
        len(handle.classes)
        if handle.classes
        else int(labels.max(initial=0)) + 1
    )
    outs = []
    for i in range(dets.shape[0]):
        m = valid[i] & (dets[i][:, 4] >= score_thr)
        per_class = [
            dets[i][m & (labels[i] == c)] for c in range(num_classes)
        ]
        outs.append(per_class)
    return outs[0] if single else outs


def train_detector(
    config,
    work_dir: str = "work_dirs/api_run",
    fake_data: bool = False,
    max_iters: Optional[int] = None,
    seed: int = 0,
    tiny: bool = False,
):
    """Programmatic training entry (reference ``apis/train.py:38``
    ``train_detector``); thin wrapper over the tools/train.py loop."""
    import sys

    from .config import Config, load_config

    cfg = load_config(config) if isinstance(config, str) else config
    argv_backup = sys.argv
    try:
        sys.argv = [
            "train.py",
            cfg.filename or config,
            "--work-dir",
            work_dir,
            "--seed",
            str(seed),
        ]
        if fake_data:
            sys.argv.append("--fake-data")
        if tiny:
            sys.argv.append("--tiny")
        if max_iters:
            sys.argv.extend(["--iters", str(max_iters)])
        from tools.train import main as train_main

        train_main()
    finally:
        sys.argv = argv_backup
