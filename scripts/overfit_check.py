"""Training-dynamics check: overfit a tiny Boosting R-CNN on a fixed
synthetic scene; losses must fall and the model must detect the objects it
was trained on.  This validates the full training math (targets, boosting
loss, optimizer) beyond single-step smoke tests."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import time

import jax
import jax.numpy as jnp
import numpy as np

from boosting_rcnn_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    step_lr_schedule,
)
from scripts.smoke_e2e import build_tiny


def make_scene(rs, canvas, n_obj=3):
    """Images with bright axis-aligned squares on dark noise; boxes = squares."""
    h, w = canvas
    img = rs.rand(h, w, 3).astype(np.float32) * 0.1
    boxes = []
    labels = []
    for _ in range(n_obj):
        bw, bh = rs.randint(24, 48), rs.randint(24, 48)
        x = rs.randint(0, w - bw)
        y = rs.randint(0, h - bh)
        c = rs.randint(0, 4)
        color = np.zeros(3)
        color[c % 3] = 2.0 + c
        img[y : y + bh, x : x + bw] = color
        boxes.append([x, y, x + bw, y + bh])
        labels.append(c)
    return img, np.array(boxes, np.float32), np.array(labels, np.int32)


def main():
    det = build_tiny()
    canvas = (128, 160)
    rs = np.random.RandomState(0)
    b, g = 2, 6
    imgs, gtb, gtl, gtm = [], [], [], []
    for i in range(b):
        img, boxes, labels = make_scene(rs, canvas)
        pb = np.zeros((g, 4), np.float32)
        pl = np.zeros((g,), np.int32)
        pm = np.zeros((g,), bool)
        pb[: len(boxes)] = boxes
        pl[: len(labels)] = labels
        pm[: len(boxes)] = True
        imgs.append(img)
        gtb.append(pb)
        gtl.append(pl)
        gtm.append(pm)
    batch = {
        "images": jnp.asarray(np.stack(imgs)),
        "gt_bboxes": jnp.asarray(np.stack(gtb)),
        "gt_labels": jnp.asarray(np.stack(gtl)),
        "gt_mask": jnp.asarray(np.stack(gtm)),
        "img_shape": jnp.asarray([[canvas[0], canvas[1]]] * b, jnp.float32),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }

    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    tx = make_optimizer(
        step_lr_schedule(0.02, 1000, decay_epochs=(), warmup_iters=50),
        momentum=0.9, weight_decay=1e-4, grad_clip_norm=35.0,
        params=variables["params"], frozen_stages=-1,
    )
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(det, anchors, nla))
    rng = jax.random.PRNGKey(1)

    t0 = time.time()
    first = None
    for it in range(300):
        state, metrics = step(state, batch, rng)
        if it == 0:
            first = {k: float(v) for k, v in metrics.items()}
        if it % 50 == 0:
            print(
                f"iter {it}: " + " ".join(
                    f"{k}={float(v):.3f}" for k, v in metrics.items()
                )
            )
    last = {k: float(v) for k, v in metrics.items()}
    print(f"300 iters in {time.time()-t0:.1f}s")

    assert last["loss"] < first["loss"] * 0.5, (first["loss"], last["loss"])
    assert last["loss_rpn_cls"] < first["loss_rpn_cls"] * 0.5
    assert last["loss_cls"] < first["loss_cls"] * 0.5

    # the trained model must detect the training objects
    dets, labels, valid = jax.jit(
        lambda v, bt: det.predict(v, bt, anchors, nla)
    )({"params": state.params, "batch_stats": state.batch_stats}, batch)
    dets, labels, valid = map(np.asarray, (dets, labels, valid))
    from boosting_rcnn_tpu.core.evaluation.mean_ap import eval_map

    results, anns = [], []
    for i in range(b):
        keep = valid[i] & (dets[i][:, 4] > 0.3)
        results.append((dets[i][keep], labels[i][keep]))
        anns.append(
            dict(
                bboxes=np.asarray(batch["gt_bboxes"][i])[np.asarray(batch["gt_mask"][i])],
                labels=np.asarray(batch["gt_labels"][i])[np.asarray(batch["gt_mask"][i])],
                bboxes_ignore=np.zeros((0, 4), np.float32),
            )
        )
    mAP, _ = eval_map(results, anns, iou_thr=0.5, num_classes=4)
    print(f"train-set mAP@0.5 after overfit: {mAP:.3f}")
    assert mAP > 0.5, mAP
    print("OVERFIT CHECK OK")


if __name__ == "__main__":
    main()
