#!/usr/bin/env python
"""Strip a training checkpoint for release (reference
``tools/model_converters/publish_model.py``): drop optimizer state, append a
content hash to the filename."""
import argparse
import hashlib
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="checkpoint dir (orbax)")
    p.add_argument("out_file", help="output pickle path (hash appended)")
    args = p.parse_args()

    import jax

    from boosting_rcnn_tpu.engine.checkpoint import load_params

    params, batch_stats = load_params(args.in_ckpt)
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "batch_stats": jax.tree.map(np.asarray, batch_stats),
    }
    blob = pickle.dumps(payload)
    sha = hashlib.sha256(blob).hexdigest()[:8]
    root, ext = os.path.splitext(args.out_file)
    out = f"{root}-{sha}{ext or '.pkl'}"
    with open(out, "wb") as f:
        f.write(blob)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
