"""Checkpoint save/restore via orbax (reference: mmcv ``CheckpointHook`` +
``load_checkpoint``/``resume_from`` semantics, SURVEY.md §5.4).

Checkpoints embed meta (framework version, step, classes) like the
reference embeds mmdet version + CLASSES (``tools/train.py:170-175``).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_checkpoint(path: str, state, meta: Optional[Dict[str, Any]] = None):
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if _HAS_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), payload, force=True)
        ckptr.wait_until_finished()
    else:
        with open(os.path.join(path, "state.npz"), "wb") as f:
            flat, treedef = jax.tree.flatten(payload)
            np.savez(f, *[np.asarray(x) for x in flat])
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)


def restore_checkpoint(path: str, state):
    """Restore into an existing state template (shapes/dtypes must match)."""
    path = os.path.abspath(path)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "state")):
        ckptr = ocp.StandardCheckpointer()
        target = jax.tree.map(np.asarray, payload)
        restored = ckptr.restore(os.path.join(path, "state"), target)
    else:
        data = np.load(os.path.join(path, "state.npz"))
        flat, treedef = jax.tree.flatten(payload)
        restored = jax.tree.unflatten(
            treedef, [data[k] for k in sorted(data.files, key=lambda s: int(s.split("_")[1]))]
        )
    meta = {}
    mp = os.path.join(path, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)
    return (
        state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ),
        meta,
    )


def load_params(path: str):
    """Weights-only load (the reference's ``load_from``)."""
    if _HAS_ORBAX and os.path.isdir(os.path.join(path, "state")):
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.join(path, "state"))
        return restored["params"], restored.get("batch_stats", {})
    raise FileNotFoundError(path)
