"""Dev smoke: build a tiny Boosting R-CNN, run loss + predict on CPU."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import time

import jax
import jax.numpy as jnp
import numpy as np

from boosting_rcnn_tpu.models.backbones.resnet import ResNet
from boosting_rcnn_tpu.models.dense_heads.atss_rpn_head import ATSSRPNCfg, ATSSRPNConvs
from boosting_rcnn_tpu.models.detectors.two_stage import (
    ProposalCfg,
    RCNNTestCfg,
    TwoStageDetector,
    TwoStageNet,
)
from boosting_rcnn_tpu.models.necks.fpn import PAFPN
from boosting_rcnn_tpu.models.roi_heads.bbox_head import BBoxHeadCfg, ConvFCBBoxHead
from boosting_rcnn_tpu.models.roi_heads.prob_roi_head import ProbRoICfg
from boosting_rcnn_tpu.ops.anchors import AnchorGenerator


def build_tiny():
    net = TwoStageNet(
        backbone=ResNet(depth=18, base_channels=8),
        neck=PAFPN(
            in_channels=[8, 16, 32, 64], out_channels=32,
            start_level=1, add_extra_convs="on_output", num_outs=5,
        ),
        rpn=ATSSRPNConvs(num_anchors=9, feat_channels=32, stacked_convs=2),
        bbox_head=ConvFCBBoxHead(num_classes=4, fc_out_channels=64),
    )
    ag = AnchorGenerator(
        strides=[8, 16, 32, 64, 128], ratios=[0.5, 1.0, 2.0],
        octave_base_scale=4, scales_per_octave=3,
    )
    det = TwoStageDetector(
        net,
        ag,
        rpn_cfg=ATSSRPNCfg(),
        roi_cfg=ProbRoICfg(boost=True, gamma=0.5, num_samples=64),
        bbox_cfg=BBoxHeadCfg(num_classes=4),
        train_proposal_cfg=ProposalCfg(nms_pre=200, max_per_img=100),
        test_proposal_cfg=ProposalCfg(nms_pre=100, max_per_img=50),
    )
    return det


def main():
    det = build_tiny()
    canvas = (128, 160)
    b, g = 2, 6
    rng = jax.random.PRNGKey(0)
    variables = det.init(rng, canvas, batch_size=1)
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    print(f"params: {n_params/1e6:.2f}M")

    anchors, nla = det.anchors_for(canvas)
    print("anchors:", anchors.shape, nla)

    rs = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rs.rand(b, *canvas, 3), jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack(
                [
                    np.concatenate(
                        [
                            np.sort(rs.rand(g, 2) * 100, axis=-1) * 0 + np.array([[10, 40]]),
                            np.sort(rs.rand(g, 2) * 100, axis=-1) * 0 + np.array([[20, 70]]),
                        ],
                        axis=-1,
                    )[:, [0, 2, 1, 3]]
                    for _ in range(b)
                ]
            ),
            jnp.float32,
        ),
        "gt_labels": jnp.asarray(rs.randint(0, 4, (b, g)), jnp.int32),
        "gt_mask": jnp.asarray(np.tile([True, True, True, False, False, False], (b, 1))),
        "img_shape": jnp.asarray([[120, 150]] * b, jnp.float32),
        "scale_factor": jnp.ones((b, 4), jnp.float32),
    }

    t0 = time.time()
    loss_fn = jax.jit(
        lambda v, r, bt: det.loss(v, r, bt, anchors, nla)
    )
    losses = loss_fn(variables, jax.random.PRNGKey(1), batch)
    print(f"loss compile+run: {time.time()-t0:.1f}s")
    for k, v in losses.items():
        print(f"  {k}: {float(v):.4f}")
        assert np.isfinite(float(v)), k

    t0 = time.time()
    pred_fn = jax.jit(lambda v, bt: det.predict(v, bt, anchors, nla))
    dets, labels, valid = pred_fn(variables, batch)
    print(f"predict compile+run: {time.time()-t0:.1f}s")
    print("dets:", dets.shape, "valid:", np.asarray(valid).sum())

    # grads flow
    t0 = time.time()
    def total(v):
        ls = det.loss(v, jax.random.PRNGKey(1), batch, anchors, nla)
        return sum(jnp.sum(x) for x in ls.values())

    gr = jax.jit(jax.grad(lambda p: total({**variables, "params": p})))(
        variables["params"]
    )
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(gr))
    print(f"grad compile+run: {time.time()-t0:.1f}s, |g|1={gn:.3e}")
    assert np.isfinite(gn) and gn > 0
    print("SMOKE OK")


if __name__ == "__main__":
    main()
