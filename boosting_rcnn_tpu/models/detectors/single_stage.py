"""Single-stage detector assembly (RetinaNet / ATSS).

Reference surface: ``mmdet/models/detectors/single_stage.py`` +
``retinanet.py``/``atss.py`` wrappers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.anchors import AnchorGenerator
from ..dense_heads.atss_head import ATSSCfg, atss_get_bboxes, atss_loss
from ..dense_heads.atss_rpn_head import flatten_levels
from ..dense_heads.retina_head import RetinaCfg, retina_get_bboxes, retina_loss


@dataclasses.dataclass(frozen=True)
class SSTestCfg:
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou_thr: float = 0.5
    max_per_img: int = 100
    # static cap on thresholded candidates entering NMS (exact mmdet keeps
    # all of them); raise via test_cfg for ultra-dense scenes
    pre_nms_top_k: int = 2048


class SingleStageNet(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head: nn.Module

    def features(self, images):
        return self.neck(self.backbone(images))

    def __call__(self, images):
        return self.head(self.features(images))

    def update_ghm_state(self, acc_c, acc_r):
        """Thread the GHM EMA bin-count buffers into ``batch_stats``
        (reference ``GHMC.acc_sum``/``GHMR.acc_sum``; see RetinaConvs)."""
        return self.head.update_ghm_state(acc_c, acc_r)


class SingleStageDetector:
    def __init__(
        self,
        net: SingleStageNet,
        anchor_generator: AnchorGenerator,
        head_cfg: Any,  # RetinaCfg | ATSSCfg
        head_type: str,  # 'retina' | 'atss'
        test_cfg: SSTestCfg = SSTestCfg(),
    ):
        self.net = net
        self.anchor_generator = anchor_generator
        self.head_cfg = head_cfg
        self.head_type = head_type
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s[1]), math.ceil(canvas_hw[1] / s[0]))
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw):
        fs = self.featmap_sizes(canvas_hw)
        flat = self.anchor_generator.flat_anchors(fs)
        nla = [a.shape[0] for a in self.anchor_generator.grid_anchors(fs)]
        return jnp.asarray(flat), tuple(nla)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        cls_l, reg_l, extra_l = self.net.apply(variables, images)
        c = self.head_cfg.num_classes
        cls = flatten_levels(cls_l, c)
        reg = flatten_levels(reg_l, 4)
        extra = flatten_levels(extra_l, 1)[..., 0] if extra_l is not None else None
        return cls, reg, extra

    def loss(
        self,
        variables,
        rng,
        batch,
        anchors,
        num_level_anchors,
        anchor_valid=None,
        axis_name=None,
    ):
        images = batch["images"]
        b = images.shape[0]
        cls, reg, extra = self._flat_outs(variables, images)
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        if self.head_type == "atss":
            return atss_loss(
                self.head_cfg, cls, reg, extra, anchors, valid,
                batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
                num_level_anchors, axis_name=axis_name,
            )
        hc = self.head_cfg
        stateful_ghm = (
            getattr(hc, "ghm_momentum", 0.0) > 0.0
            or getattr(hc, "ghmr_momentum", 0.0) > 0.0
        )
        if stateful_ghm:
            # GHM momentum>0: read the EMA acc_sum buffers, compute the
            # loss with the post-update weights, and write the new buffers
            # back through the mutable-batch_stats mechanism (same call
            # convention as Seesaw counts in two_stage.py::_seesaw_counts;
            # a direct loss call stays pure — the update is discarded).
            head_stats = variables.get("batch_stats", {}).get("head", {})
            acc_c = (head_stats.get("ghm_acc_sum_c")
                     if hc.ghm_momentum > 0.0 else None)
            acc_r = (head_stats.get("ghm_acc_sum_r")
                     if hc.ghmr_momentum > 0.0 else None)
            losses, (new_c, new_r) = retina_loss(
                hc, cls, reg, anchors, valid,
                batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
                axis_name=axis_name, ghm_acc=(acc_c, acc_r),
            )
            if hasattr(self.net, "_net"):  # _MutableNet shim (train step)
                self.net.apply(
                    variables, new_c, new_r,
                    method=SingleStageNet.update_ghm_state,
                )
            return losses
        return retina_loss(
            hc, cls, reg, anchors, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors, rescale=True):
        images = batch["images"]
        cls, reg, extra = self._flat_outs(variables, images)
        tc = self.test_cfg
        if self.head_type == "atss":
            fn = lambda c_, r_, e_, shp, sf: atss_get_bboxes(
                self.head_cfg, c_, r_, e_, anchors, num_level_anchors, shp, sf,
                rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
                nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
                pre_nms_top_k=tc.pre_nms_top_k,
            )
            return jax.vmap(fn)(cls, reg, extra, batch["img_shape"], batch["scale_factor"])
        fn = lambda c_, r_, shp, sf: retina_get_bboxes(
            self.head_cfg, c_, r_, anchors, num_level_anchors, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
            pre_nms_top_k=tc.pre_nms_top_k,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"], batch["scale_factor"])


class FCOSDetector:
    """Point-based single-stage detector (FCOS)."""

    def __init__(self, net: SingleStageNet, head_cfg, test_cfg: SSTestCfg = SSTestCfg()):
        from ..dense_heads.fcos_head import FCOSCfg

        self.net = net
        self.head_cfg: FCOSCfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        """Points + static geometry (named for API parity with the anchor
        detectors; returns (points pack, per-level counts))."""
        from ..dense_heads.fcos_head import fcos_points

        fs = self.featmap_sizes(canvas_hw)
        pts, strides, lo, hi = fcos_points(fs, self.head_cfg.strides)
        nlp = tuple(h * w for h, w in fs)
        pack = (
            jnp.asarray(pts), jnp.asarray(strides),
            jnp.asarray(lo), jnp.asarray(hi),
        )
        return pack, nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, ctr_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        ctr = flatten_levels(ctr_l, 1)[..., 0]
        return cls, reg, ctr

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.fcos_head import fcos_loss

        pts, strides, lo, hi = pack
        cls, reg, ctr = self._flat_outs(variables, batch["images"])
        return fcos_loss(
            self.head_cfg, cls, reg, ctr, pts, lo, hi, strides,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ..dense_heads.fcos_head import fcos_get_bboxes

        pts = pack[0]
        cls, reg, ctr = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, e_, shp, sf: fcos_get_bboxes(
            self.head_cfg, c_, r_, e_, pts, num_level_points, shp, sf, rescale,
            nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, ctr, batch["img_shape"], batch["scale_factor"])


class GFLDetector:
    """GFL single-stage detector (ATSS assignment + QFL/DFL losses)."""

    def __init__(self, net: SingleStageNet, anchor_generator, head_cfg,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.anchor_generator = anchor_generator
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s[1]), math.ceil(canvas_hw[1] / s[0]))
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw):
        import numpy as np

        fs = self.featmap_sizes(canvas_hw)
        flat = self.anchor_generator.flat_anchors(fs)
        per = self.anchor_generator.grid_anchors(fs)
        nla = [a.shape[0] for a in per]
        strides = np.concatenate(
            [
                np.full(n, self.anchor_generator.strides[i][0], np.float32)
                for i, n in enumerate(nla)
            ]
        )
        return (jnp.asarray(flat), jnp.asarray(strides)), tuple(nla)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, _ = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4 * (self.head_cfg.reg_max + 1))
        return cls, reg

    def loss(self, variables, rng, batch, pack, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.gfl_head import gfl_loss

        anchors, strides = pack
        cls, reg = self._flat_outs(variables, batch["images"])
        b = cls.shape[0]
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return gfl_loss(
            self.head_cfg, cls, reg, anchors, strides, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            num_level_anchors, axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_anchors, rescale=True):
        from ..dense_heads.gfl_head import gfl_get_bboxes

        anchors, strides = pack
        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: gfl_get_bboxes(
            self.head_cfg, c_, r_, anchors, strides, num_level_anchors,
            shp, sf, rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"], batch["scale_factor"])


class SSDDetector:
    """SSD (multi-generator anchors, no neck — the VGG extras form the
    pyramid; reference ``mmdet/models/detectors/ssd.py`` wrapper)."""

    def __init__(self, net, anchor_generators, head_cfg,
                 input_size: int = 300, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.anchor_generators = anchor_generators
        self.head_cfg = head_cfg
        self.input_size = input_size
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        # VGG300 pyramid: 38, 19, 10, 5, 3, 1 for 300 input
        import math

        h, w = canvas_hw
        sizes = []
        fh, fw = math.ceil(h / 8), math.ceil(w / 8)
        for i in range(6):
            sizes.append((fh, fw))
            if i < 2:
                fh, fw = math.ceil(fh / 2), math.ceil(fw / 2)
            elif i < 4:
                fh, fw = math.ceil((fh - 1) / 2), math.ceil((fw - 1) / 2)
            else:
                fh, fw = max(fh - 2, 1), max(fw - 2, 1)
        return sizes

    def anchors_for(self, canvas_hw):
        import numpy as np

        # derive actual featmap sizes from a real trace (robust to padding)
        sizes = self._traced_sizes(canvas_hw)
        per = [
            g.grid_anchors([s])[0]
            for g, s in zip(self.anchor_generators, sizes)
        ]
        nla = tuple(a.shape[0] for a in per)
        return jnp.asarray(np.concatenate(per, 0)), nla

    def _traced_sizes(self, canvas_hw):
        """Abstract forward through backbone + neck: the SSD pyramid may
        end in the backbone extras (VGG) or in an SSDNeck (SSDLite)."""
        import jax

        x = jnp.zeros((1, *canvas_hw, 3))
        bb, nk = self.net.backbone, self.net.neck

        def fwd(vs, im):
            feats = bb.apply(vs["bb"], im)
            if vs["nk"] is None:
                return feats
            return nk.apply(vs["nk"], feats)

        key = jax.random.PRNGKey(0)
        bb_vars = jax.eval_shape(bb.init, key, x)
        feats_shape = jax.eval_shape(lambda v, im: bb.apply(v, im),
                                     bb_vars, x)
        nk_vars = None
        if hasattr(nk, "init"):  # a flax neck (SSDNeck); IdentityNeck isn't
            feats_zeros = tuple(
                jnp.zeros(f.shape, f.dtype) for f in feats_shape)
            nk_vars = jax.eval_shape(nk.init, key, feats_zeros)
        out = jax.eval_shape(fwd, {"bb": bb_vars, "nk": nk_vars}, x)
        return [(o.shape[1], o.shape[2]) for o in out]

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, _ = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes + 1)
        reg = flatten_levels(reg_l, 4)
        return cls, reg

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.ssd_head import ssd_loss

        cls, reg = self._flat_outs(variables, batch["images"])
        b = cls.shape[0]
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return ssd_loss(
            self.head_cfg, cls, reg, anchors, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors, rescale=True):
        from ..dense_heads.ssd_head import ssd_get_bboxes

        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: ssd_get_bboxes(
            self.head_cfg, c_, r_, anchors, num_level_anchors, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"], batch["scale_factor"])


class YOLOV3Detector:
    """YOLOv3 (reference ``mmdet/models/detectors/yolo.py``)."""

    def __init__(self, net, head_cfg, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg
        from ..dense_heads.yolo_head import yolo_anchor_generators

        self.generators = yolo_anchor_generators()

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        import numpy as np

        fs = self.featmap_sizes(canvas_hw)
        per = [g.grid_anchors([s])[0] for g, s in zip(self.generators, fs)]
        nla = tuple(a.shape[0] for a in per)
        strides = np.concatenate(
            [np.full(n, self.head_cfg.strides[i], np.float32)
             for i, n in enumerate(nla)]
        )
        return (jnp.asarray(np.concatenate(per, 0)), jnp.asarray(strides)), nla

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        preds = self.net.apply(variables, images)
        return flatten_levels(preds, 5 + self.head_cfg.num_classes)

    def loss(self, variables, rng, batch, pack, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.yolo_head import yolo_loss

        anchors, strides = pack
        preds = self._flat(variables, batch["images"])
        b = preds.shape[0]
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return yolo_loss(
            self.head_cfg, preds, anchors, strides, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_anchors, rescale=True):
        from ..dense_heads.yolo_head import yolo_get_bboxes

        anchors, strides = pack
        preds = self._flat(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda p_, shp, sf: yolo_get_bboxes(
            self.head_cfg, p_, anchors, strides, shp, sf, rescale,
            score_thr=tc.score_thr, nms_iou_thr=tc.nms_iou_thr,
            max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(preds, batch["img_shape"], batch["scale_factor"])


class CenterNetDetector:
    """Anchor-free, NMS-free center-point detector (reference
    ``mmdet/models/detectors/centernet.py``)."""

    def __init__(self, net, head_cfg, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        s = self.head_cfg.stride
        return [(canvas_hw[0] // s, canvas_hw[1] // s)]

    def anchors_for(self, canvas_hw):
        # point-based: no anchors; keep the (pack, counts) API shape
        h, w = self.featmap_sizes(canvas_hw)[0]
        return jnp.zeros((0,)), (h * w,)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.centernet_head import centernet_loss

        heat, wh, off = self.net.apply(variables, batch["images"])
        return centernet_loss(
            self.head_cfg, heat, wh, off,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ..dense_heads.centernet_head import centernet_decode

        heat, wh, off = self.net.apply(variables, batch["images"])
        fn = lambda h_, w_, o_, shp, sf: centernet_decode(
            self.head_cfg, h_, w_, o_, shp, sf, rescale,
            topk=self.test_cfg.max_per_img,
        )
        return jax.vmap(fn)(heat, wh, off, batch["img_shape"], batch["scale_factor"])


class YOLOXDetector:
    """YOLOX (reference ``mmdet/models/detectors/yolox.py``): anchor-free
    decoupled head + SimOTA assignment, NMS decode."""

    def __init__(self, net, head_cfg, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg
        # flipped by the YOLOXModeSwitch wiring in tools/train.py for the
        # final mosaic/mixup-free epochs (reference yolox_head.py:111);
        # static at trace time — the switch re-jits the train step
        self.use_l1 = False

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.yolox_head import yolox_points

        fs = self.featmap_sizes(canvas_hw)
        pts = yolox_points(fs, self.head_cfg.strides)
        nlp = tuple(h * w for h, w in fs)
        return jnp.asarray(pts), nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, obj_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        obj = flatten_levels(obj_l, 1)[..., 0]
        return cls, reg, obj

    def loss(self, variables, rng, batch, priors, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.yolox_head import yolox_loss

        cls, reg, obj = self._flat_outs(variables, batch["images"])
        return yolox_loss(
            self.head_cfg, cls, reg, obj, priors,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name, use_l1=self.use_l1,
        )

    def predict(self, variables, batch, priors, num_level_points, rescale=True):
        from ..dense_heads.yolox_head import yolox_get_bboxes

        cls, reg, obj = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, o_, shp, sf: yolox_get_bboxes(
            self.head_cfg, c_, r_, o_, priors, shp, sf, rescale,
            score_thr=tc.score_thr, nms_iou_thr=tc.nms_iou_thr,
            max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, obj, batch["img_shape"], batch["scale_factor"])


class FoveaDetector:
    """FoveaBox (reference ``mmdet/models/detectors/fovea.py``): anchor-free
    per-level scale assignment with fovea-region positives."""

    def __init__(self, net: SingleStageNet, head_cfg, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        import numpy as np

        from ..dense_heads.fovea_head import fovea_points

        fs = self.featmap_sizes(canvas_hw)
        pack = fovea_points(
            fs, self.head_cfg.strides, self.head_cfg.base_edge_list,
            self.head_cfg.scale_ranges,
        )
        widths = np.concatenate(
            [np.full(h * w, w, np.float32) for h, w in fs]
        )
        heights = np.concatenate(
            [np.full(h * w, h, np.float32) for h, w in fs]
        )
        nlp = tuple(h * w for h, w in fs)
        return (
            tuple(jnp.asarray(a) for a in pack),
            jnp.asarray(widths),
            jnp.asarray(heights),
        ), nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        cls_l, reg_l, _ = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        return cls, reg

    def loss(self, variables, rng, batch, geom, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.fovea_head import fovea_loss

        pack, widths, heights = geom
        cls, reg = self._flat_outs(variables, batch["images"])
        return fovea_loss(
            self.head_cfg, cls, reg, pack, widths, heights,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, geom, num_level_points, rescale=True):
        from ..dense_heads.fovea_head import fovea_get_bboxes

        pack = geom[0]
        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: fovea_get_bboxes(
            self.head_cfg, c_, r_, pack, shp, sf, rescale,
            score_thr=tc.score_thr, nms_iou_thr=tc.nms_iou_thr,
            max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"], batch["scale_factor"])


class VFNetDetector:
    """VarifocalNet (reference ``mmdet/models/detectors/vfnet.py``):
    point-based head with star-dconv refinement and IoU-aware varifocal
    classification."""

    def __init__(self, net: SingleStageNet, head_cfg,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.fcos_head import fcos_points

        fs = self.featmap_sizes(canvas_hw)
        pts, strides, _, _ = fcos_points(fs, self.head_cfg.strides)
        nlp = tuple(h * w for h, w in fs)
        return (jnp.asarray(pts), jnp.asarray(strides)), nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, ref_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        ref = flatten_levels(ref_l, 4)
        return cls, reg, ref

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.vfnet_head import vfnet_loss

        pts, strides = pack
        cls, reg, ref = self._flat_outs(variables, batch["images"])
        return vfnet_loss(
            self.head_cfg, cls, reg, ref, pts, strides, num_level_points,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ..dense_heads.vfnet_head import vfnet_get_bboxes

        pts = pack[0]
        cls, _, ref = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: vfnet_get_bboxes(
            self.head_cfg, c_, r_, pts, num_level_points, shp, sf, rescale,
            nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, ref, batch["img_shape"], batch["scale_factor"])


class FSAFDetector:
    """FSAF (reference ``mmdet/models/detectors/fsaf.py``): anchor-free
    RetinaNet branch with online level selection; anchors are stride-sized
    squares used only as TBLR priors."""

    def __init__(self, net: SingleStageNet, head_cfg, anchor_generator,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.anchor_generator = anchor_generator
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        fs = self.featmap_sizes(canvas_hw)
        per = self.anchor_generator.grid_anchors(fs)
        nla = tuple(a.shape[0] for a in per)
        import numpy as np

        return jnp.asarray(np.concatenate(per, 0)), nla

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        return cls, reg

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.fsaf_head import fsaf_loss

        images = batch["images"]
        b = images.shape[0]
        cls, reg = self._flat_outs(variables, images)
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return fsaf_loss(
            self.head_cfg, cls, reg, anchors, valid, num_level_anchors,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.fsaf_head import fsaf_get_bboxes

        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: fsaf_get_bboxes(
            self.head_cfg, c_, r_, anchors, num_level_anchors, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"], batch["scale_factor"])


class PAADetector:
    """PAA (reference ``mmdet/models/detectors/paa.py``): ATSS architecture
    with probabilistic (GMM) anchor assignment and score voting."""

    def __init__(self, net: SingleStageNet, head_cfg, anchor_generator,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.anchor_generator = anchor_generator
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        def stride_of(s):
            return s if isinstance(s, (int, float)) else s[0]

        return [
            (
                math.ceil(canvas_hw[0] / stride_of(s)),
                math.ceil(canvas_hw[1] / stride_of(s)),
            )
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw):
        import numpy as np

        fs = self.featmap_sizes(canvas_hw)
        per = self.anchor_generator.grid_anchors(fs)
        nla = tuple(a.shape[0] for a in per)
        return jnp.asarray(np.concatenate(per, 0)), nla

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, iou_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        iou = flatten_levels(iou_l, 1)[..., 0]
        return cls, reg, iou

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.paa_head import paa_loss

        b = batch["images"].shape[0]
        cls, reg, iou = self._flat_outs(variables, batch["images"])
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return paa_loss(
            self.head_cfg, cls, reg, iou, anchors, valid, num_level_anchors,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.paa_head import paa_get_bboxes

        cls, reg, iou = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, i_, shp, sf: paa_get_bboxes(
            self.head_cfg, c_, r_, i_, anchors, num_level_anchors, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, iou, batch["img_shape"],
                            batch["scale_factor"])


class YOLOFDetector:
    """YOLOF (reference ``mmdet/models/detectors/yolof.py``): single C5
    level through a DilatedEncoder, uniform matching."""

    def __init__(self, net: SingleStageNet, head_cfg, anchor_generator,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.anchor_generator = anchor_generator
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [(math.ceil(canvas_hw[0] / 32), math.ceil(canvas_hw[1] / 32))]

    def anchors_for(self, canvas_hw):
        import numpy as np

        fs = self.featmap_sizes(canvas_hw)
        per = self.anchor_generator.grid_anchors(fs)
        nla = tuple(a.shape[0] for a in per)
        return jnp.asarray(np.concatenate(per, 0)), nla

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        return cls, reg

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.yolof_head import yolof_loss

        b = batch["images"].shape[0]
        cls, reg = self._flat_outs(variables, batch["images"])
        valid = (
            anchor_valid
            if anchor_valid is not None
            else jnp.ones((b, anchors.shape[0]), bool)
        )
        return yolof_loss(
            self.head_cfg, cls, reg, anchors, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.yolof_head import yolof_get_bboxes

        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: yolof_get_bboxes(
            self.head_cfg, c_, r_, anchors, shp, sf, rescale,
            nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"],
                            batch["scale_factor"])


class RepPointsDetector:
    """RepPoints (reference ``mmdet/models/detectors/reppoints_detector.py``)."""

    def __init__(self, net: SingleStageNet, head_cfg,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.fcos_head import fcos_points

        fs = self.featmap_sizes(canvas_hw)
        pts, strides, _, _ = fcos_points(fs, self.head_cfg.strides)
        nlp = tuple(h * w for h, w in fs)
        pack = jnp.concatenate(
            [jnp.asarray(pts), jnp.asarray(strides)[:, None]], axis=-1
        )  # (P, 3): x, y, stride
        return pack, nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, init_l, refine_l, moment = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        n2 = self.head_cfg.num_points * 2
        init = flatten_levels(init_l, n2)
        refine = flatten_levels(refine_l, n2)
        return cls, init, refine, moment

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.reppoints_head import reppoints_loss

        cls, init, refine, moment = self._flat_outs(
            variables, batch["images"]
        )
        return reppoints_loss(
            self.head_cfg, cls, init, refine, moment, pack,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ..dense_heads.reppoints_head import reppoints_get_bboxes

        cls, _, refine, moment = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: reppoints_get_bboxes(
            self.head_cfg, c_, r_, moment, pack, num_level_points, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, refine, batch["img_shape"],
                            batch["scale_factor"])


class CornerNetDetector:
    """CornerNet (reference ``mmdet/models/detectors/cornernet.py``):
    stacked-hourglass corner-pair detector; losses on every stack, decode
    from the last."""

    def __init__(self, net: SingleStageNet, head_cfg):
        self.net = net
        self.head_cfg = head_cfg

    def featmap_sizes(self, canvas_hw):
        s = self.head_cfg.stride
        return [(canvas_hw[0] // s, canvas_hw[1] // s)]

    def anchors_for(self, canvas_hw):
        h, w = self.featmap_sizes(canvas_hw)[0]
        return jnp.zeros((0,)), (h * w,)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.corner_head import corner_loss_single

        loss_single = getattr(self, "_loss_single", None)             or corner_loss_single
        outs = self.net.apply(variables, batch["images"])
        losses = {}
        for si, out in enumerate(outs):
            per = jax.vmap(
                lambda o, gb, gl, gm: loss_single(
                    self.head_cfg, o, gb, gl, gm
                )
            )(out, batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"])
            sfx = "" if si == len(outs) - 1 else f"_aux{si}"
            for k, v in per.items():
                losses[f"{k}{sfx}"] = jnp.mean(v)
        return losses

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ..dense_heads.corner_head import corner_decode_single

        decode_single = getattr(self, "_decode_single", None)             or corner_decode_single
        outs = self.net.apply(variables, batch["images"])
        out = outs[-1]
        fn = lambda o, shp, sf: decode_single(
            self.head_cfg, o, shp, sf, rescale
        )
        return jax.vmap(fn)(out, batch["img_shape"], batch["scale_factor"])


class FreeAnchorDetector:
    """FreeAnchor RetinaNet (reference free_anchor_retina_head.py): shares
    the Retina towers; only the loss differs."""

    def __init__(self, net: SingleStageNet, head_cfg, retina_cfg,
                 anchor_generator, test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.retina_cfg = retina_cfg  # decode cfg (shared with RetinaNet)
        self.anchor_generator = anchor_generator
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        def stride_of(s):
            return s if isinstance(s, (int, float)) else s[0]

        return [
            (
                math.ceil(canvas_hw[0] / stride_of(s)),
                math.ceil(canvas_hw[1] / stride_of(s)),
            )
            for s in self.anchor_generator.strides
        ]

    def anchors_for(self, canvas_hw):
        import numpy as np

        fs = self.featmap_sizes(canvas_hw)
        per = self.anchor_generator.grid_anchors(fs)
        nla = tuple(x.shape[0] for x in per)
        return jnp.asarray(np.concatenate(per, 0)), nla

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, _ = self.net.apply(variables, images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        return cls, reg

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.free_anchor_head import free_anchor_loss

        cls, reg = self._flat_outs(variables, batch["images"])
        return free_anchor_loss(
            self.head_cfg, cls, reg, anchors,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.retina_head import retina_get_bboxes

        cls, reg = self._flat_outs(variables, batch["images"])
        tc = self.test_cfg
        fn = lambda c_, r_, shp, sf: retina_get_bboxes(
            self.retina_cfg, c_, r_, anchors, num_level_anchors, shp, sf,
            rescale, nms_pre=tc.nms_pre, score_thr=tc.score_thr,
            nms_iou_thr=tc.nms_iou_thr, max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, batch["img_shape"],
                            batch["scale_factor"])


class AutoAssignDetector:
    """AutoAssign (reference ``mmdet/models/detectors/autoassign.py``):
    FCOS architecture with fully differentiable assignment.  Uses the FCOS
    towers; the centerness branch doubles as the objectness (reference
    AutoAssignHead reuses conv_centerness)."""

    def __init__(self, net: SingleStageNet, head_cfg,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.fcos_head import fcos_points

        fs = self.featmap_sizes(canvas_hw)
        pts, strides, _, _ = fcos_points(fs, self.head_cfg.strides)
        nlp = tuple(h * w for h, w in fs)
        return (jnp.asarray(pts), jnp.asarray(strides)), nlp

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        variables = self.net.init(rng, images)
        # learnable center prior lives beside the network params
        variables = dict(variables)
        params = dict(variables["params"])
        params["center_prior"] = {
            "mean": jnp.zeros((self.head_cfg.num_classes, 2)),
            "sigma": jnp.ones((self.head_cfg.num_classes, 2)),
        }
        variables["params"] = params
        return variables

    def _strip(self, variables):
        params = {k: v for k, v in variables["params"].items()
                  if k != "center_prior"}
        return {"params": params,
                "batch_stats": variables.get("batch_stats", {})}

    def _flat_outs(self, variables, images, strides_flat):
        from ..dense_heads.atss_rpn_head import flatten_levels

        cls_l, reg_l, ctr_l = self.net.apply(self._strip(variables), images)
        cls = flatten_levels(cls_l, self.head_cfg.num_classes)
        reg = flatten_levels(reg_l, 4)
        obj = flatten_levels(ctr_l, 1)[..., 0]
        # image-unit distances (reference forward_single: relu * stride)
        dist = jax.nn.relu(reg) * strides_flat[None, :, None]
        return cls, dist, obj

    def loss(self, variables, rng, batch, pack, num_level_points,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.autoassign_head import autoassign_loss

        pts, strides = pack
        cls, dist, obj = self._flat_outs(variables, batch["images"], strides)
        cp = variables["params"]["center_prior"]
        return autoassign_loss(
            self.head_cfg, cls, dist, obj, cp["mean"], cp["sigma"],
            pts, strides,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, pack, num_level_points, rescale=True):
        from ...ops.nms import multiclass_nms_padded
        from ..dense_heads.autoassign_head import distance2bbox
        from ...ops.box_ops import clip_boxes

        pts, strides = pack
        cls, dist, obj = self._flat_outs(variables, batch["images"], strides)
        tc = self.test_cfg

        def one(c_, d_, o_, shp, sf):
            scores_all = jax.nn.sigmoid(c_.astype(jnp.float32)) * jax.nn.sigmoid(
                o_.astype(jnp.float32)
            )[:, None]
            sel_s, sel_b = [], []
            start = 0
            for np_ in num_level_points:
                s = jax.lax.dynamic_slice_in_dim(scores_all, start, np_)
                dd = jax.lax.dynamic_slice_in_dim(d_, start, np_)
                pt = jax.lax.dynamic_slice_in_dim(pts, start, np_)
                k = min(tc.nms_pre, np_)
                _, ti = jax.lax.top_k(jnp.max(s, axis=-1), k)
                sel_s.append(s[ti])
                sel_b.append(clip_boxes(distance2bbox(pt[ti], dd[ti]), shp))
                start += np_
            scores = jnp.concatenate(sel_s)
            boxes = jnp.concatenate(sel_b)
            if rescale:
                boxes = boxes / sf.reshape(1, 4)
            return multiclass_nms_padded(
                boxes, scores, score_thr=tc.score_thr,
                iou_threshold=tc.nms_iou_thr, max_per_img=tc.max_per_img,
            )

        return jax.vmap(one)(cls, dist, obj, batch["img_shape"],
                             batch["scale_factor"])


class SABLDetector:
    """SABL RetinaNet (reference ``sabl_retina_head.py``): square anchors +
    side-aware bucketing localization."""

    def __init__(self, net: SingleStageNet, head_cfg,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.guided_anchor_head import square_anchors

        fs = self.featmap_sizes(canvas_hw)
        sq, nla = square_anchors(self.head_cfg.ga(), fs)
        self._approxs_cache = (canvas_hw, fs)
        return sq, tuple(nla)

    def _approxs(self, canvas_hw):
        from ..dense_heads.guided_anchor_head import approx_anchors

        fs = self.featmap_sizes(canvas_hw)
        return approx_anchors(self.head_cfg.ga(), fs)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        cls_l, bcls_l, breg_l = self.net.apply(variables, images)
        c = self.head_cfg.num_classes
        s4 = self.head_cfg.side_num * 4
        return (flatten_levels(cls_l, c), flatten_levels(bcls_l, s4),
                flatten_levels(breg_l, s4))

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.sabl_head import sabl_loss

        images = batch["images"]
        cls, bcls, breg = self._flat_outs(variables, images)
        approxs = self._approxs((images.shape[1], images.shape[2]))
        return sabl_loss(
            self.head_cfg, cls, bcls, breg, anchors, approxs,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.sabl_head import sabl_get_bboxes

        images = batch["images"]
        cls, bcls, breg = self._flat_outs(variables, images)
        tc = self.test_cfg
        fn = lambda c_, bc_, br_, shp, sf: sabl_get_bboxes(
            self.head_cfg, c_, bc_, br_, anchors, shp, sf, rescale,
            score_thr=tc.score_thr, nms_iou_thr=tc.nms_iou_thr,
            max_per_img=tc.max_per_img, nms_pre=tc.nms_pre,
        )
        return jax.vmap(fn)(cls, bcls, breg, batch["img_shape"],
                            batch["scale_factor"])


class GARetinaDetector:
    """GA-RetinaNet (reference ``detectors/retinanet.py`` +
    ``ga_retina_head.py``)."""

    def __init__(self, net: SingleStageNet, head_cfg, num_classes: int,
                 smooth_l1_beta: float = 0.04,
                 test_cfg: SSTestCfg = SSTestCfg()):
        self.net = net
        self.head_cfg = head_cfg  # GACfg
        self.num_classes = num_classes
        self.smooth_l1_beta = smooth_l1_beta
        self.test_cfg = test_cfg

    def featmap_sizes(self, canvas_hw):
        import math

        return [
            (math.ceil(canvas_hw[0] / s), math.ceil(canvas_hw[1] / s))
            for s in self.head_cfg.strides
        ]

    def anchors_for(self, canvas_hw):
        from ..dense_heads.guided_anchor_head import square_anchors

        sq, nla = square_anchors(self.head_cfg, self.featmap_sizes(canvas_hw))
        return sq, tuple(nla)

    def init(self, rng, canvas_hw, batch_size: int = 1):
        images = jnp.zeros((batch_size, *canvas_hw, 3), jnp.float32)
        return self.net.init(rng, images)

    def _flat_outs(self, variables, images):
        cls_l, reg_l, shape_l, loc_l = self.net.apply(variables, images)
        return (flatten_levels(cls_l, self.num_classes),
                flatten_levels(reg_l, 4),
                flatten_levels(shape_l, 2),
                flatten_levels(loc_l, 1)[..., 0])

    def loss(self, variables, rng, batch, anchors, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.guided_anchor_head import (
            approx_anchors,
            ga_retina_loss,
        )

        images = batch["images"]
        cls, reg, shp, loc = self._flat_outs(variables, images)
        fs = self.featmap_sizes((images.shape[1], images.shape[2]))
        approxs = approx_anchors(self.head_cfg, fs)
        return ga_retina_loss(
            self.head_cfg, self.num_classes, cls, reg, shp, loc,
            anchors, approxs, fs, batch["gt_bboxes"], batch["gt_labels"],
            batch["gt_mask"], smooth_l1_beta=self.smooth_l1_beta,
            axis_name=axis_name,
        )

    def predict(self, variables, batch, anchors, num_level_anchors,
                rescale=True):
        from ..dense_heads.guided_anchor_head import ga_retina_get_bboxes

        images = batch["images"]
        cls, reg, shp, loc = self._flat_outs(variables, images)
        tc = self.test_cfg
        fn = lambda c_, r_, s_, l_, shp_, sf: ga_retina_get_bboxes(
            self.head_cfg, c_, r_, s_, l_, anchors, shp_, sf, rescale,
            score_thr=tc.score_thr, nms_iou_thr=tc.nms_iou_thr,
            max_per_img=tc.max_per_img,
        )
        return jax.vmap(fn)(cls, reg, shp, loc, batch["img_shape"],
                            batch["scale_factor"])


class LDDetector(GFLDetector):
    """LD: localization distillation (reference ``detectors/kd_one_stage.py``
    + ``dense_heads/ld_head.py``).  A GFL student whose DFL corner
    distributions are distilled from a frozen GFL teacher with a
    temperature-T KL term on positives."""

    def __init__(self, net, anchor_generator, head_cfg, teacher=None,
                 teacher_variables=None, ld_weight: float = 0.25,
                 ld_T: float = 10.0, test_cfg: SSTestCfg = SSTestCfg()):
        super().__init__(net, anchor_generator, head_cfg, test_cfg=test_cfg)
        self.teacher = teacher  # GFLDetector (same head geometry)
        self.teacher_variables = teacher_variables
        self.ld_weight = ld_weight
        self.ld_T = ld_T

    def set_teacher_variables(self, variables):
        self.teacher_variables = variables

    def loss(self, variables, rng, batch, pack, num_level_anchors,
             anchor_valid=None, axis_name=None):
        from ..dense_heads.gfl_head import gfl_loss

        anchors, strides = pack
        cls, reg = self._flat_outs(variables, batch["images"])
        b = cls.shape[0]
        valid = (anchor_valid if anchor_valid is not None
                 else jnp.ones((b, anchors.shape[0]), bool))
        soft_reg = None
        if self.teacher is not None and self.teacher_variables is not None:
            _, soft_reg = self.teacher._flat_outs(
                self.teacher_variables, batch["images"])
            soft_reg = jax.lax.stop_gradient(soft_reg)
        return gfl_loss(
            self.head_cfg, cls, reg, anchors, strides, valid,
            batch["gt_bboxes"], batch["gt_labels"], batch["gt_mask"],
            num_level_anchors, axis_name=axis_name,
            soft_reg=soft_reg, ld_weight=self.ld_weight, ld_T=self.ld_T,
        )
