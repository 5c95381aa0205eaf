"""Logger + json train-log (the reference's ``get_root_logger`` +
TextLoggerHook ``.log.json`` surface, SURVEY.md §5.5)."""
from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Dict, Optional


def get_root_logger(log_file: Optional[str] = None, level=logging.INFO):
    logger = logging.getLogger("boosting_rcnn_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(level)
    logger.propagate = False
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class JsonLogWriter:
    """Append-only ``.log.json`` writer (one json object per line, like the
    reference's TextLoggerHook output consumed by ``analyze_logs.py``)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path

    def write(self, record: Dict[str, Any]):
        with open(self.path, "a") as f:
            f.write(json.dumps({k: _jsonable(v) for k, v in record.items()}) + "\n")


def _jsonable(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def collect_env() -> Dict[str, Any]:
    """Environment fingerprint (reference ``collect_env``,
    ``tools/train.py:139-144``)."""
    import jax

    info = {
        "python": sys.version.split()[0],
        "jax": jax.__version__,
        "devices": [str(d) for d in jax.devices()],
        "backend": jax.default_backend(),
    }
    try:
        import flax, optax

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info
