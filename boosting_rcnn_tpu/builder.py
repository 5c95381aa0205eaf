"""Config-dict -> model builder (the registry layer).

Replaces the reference's string-type registries (``mmdet/models/builder.py:
7-15``) with one explicit factory per component family.  The config dict
surface is kept compatible with the reference configs so users can port
their configs with minimal edits.
"""
from __future__ import annotations

import copy
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from .models.backbones.resnet import ResNet
from .models.dense_heads.atss_rpn_head import ATSSRPNCfg, ATSSRPNConvs
from .models.dense_heads.rpn_head import RPNCfg, RPNConvs
from .models.detectors.two_stage import (
    ProposalCfg,
    RCNNTestCfg,
    TwoStageDetector,
    TwoStageNet,
)
from .models.necks.fpn import FPN, PAFPN, ChannelMapper
from .models.roi_heads.bbox_head import BBoxHeadCfg, ConvFCBBoxHead
from .models.roi_heads.prob_roi_head import ProbRoICfg
from .ops.anchors import AnchorGenerator


class Registry:
    """Minimal string->factory registry (user-extensible like the
    reference's ``@MODELS.register_module``)."""

    def __init__(self, name: str):
        self.name = name
        self._map: Dict[str, Callable] = {}

    def register(self, name: Optional[str] = None):
        def deco(fn):
            self._map[name or fn.__name__] = fn
            return fn

        return deco

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(f"{name} not registered in {self.name}: {list(self._map)}")
        return self._map[name]


BACKBONES = Registry("backbones")
NECKS = Registry("necks")
DETECTORS = Registry("detectors")

_LOSS_BOX_TYPES = {
    "IoULoss": "iou",
    "GIoULoss": "giou",
    "EIoULoss": "eiou",
    "FocalEIoULoss": "focal_eiou",
    "DIoULoss": "diou",
    "CIoULoss": "ciou",
    "BoundedIoULoss": "bounded_iou",
    "L1Loss": "l1",
    "SmoothL1Loss": "smooth_l1",
    "BalancedL1Loss": "balanced_l1",
}


@BACKBONES.register("ResNet")
def build_resnet(cfg: Dict[str, Any], dtype=jnp.float32):
    return ResNet(
        depth=cfg.get("depth", 50),
        num_stages=cfg.get("num_stages", 4),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        strides=tuple(cfg.get("strides", (1, 2, 2, 2))),
        dilations=tuple(cfg.get("dilations", (1, 1, 1, 1))),
        base_channels=cfg.get("base_channels", 64),
        deep_stem=cfg.get("deep_stem", False),
        frozen_stages=cfg.get("frozen_stages", -1),
        norm_eval=cfg.get("norm_eval", True),
        dcn=cfg.get("dcn"),
        stage_with_dcn=tuple(
            cfg.get("stage_with_dcn", (False, False, False, False))
        ),
        plugins=tuple(cfg["plugins"]) if cfg.get("plugins") else None,
        conv_cfg=cfg.get("conv_cfg"),
        norm_cfg=cfg.get("norm_cfg"),
        style=cfg.get("style", "pytorch"),
        dtype=dtype,
    )


@BACKBONES.register("HiddenMixupResNet")
def build_hidden_mixup_resnet(cfg: Dict[str, Any], dtype=jnp.float32):
    """Thesis two-view backbone (reference
    ``backbones/hiddenMixupResnet.py:307``): plain ResNet on one view;
    the two-view mixup/contrastive machinery lives in
    ``models/thesis_extras.HiddenMixupResNet``."""
    from .models.thesis_extras import HiddenMixupResNet

    return HiddenMixupResNet(resnet=build_resnet(cfg, dtype=dtype))


@BACKBONES.register("ResNeXt")
def build_resnext(cfg: Dict[str, Any], dtype=jnp.float32):
    return ResNet(
        depth=cfg.get("depth", 101),
        num_stages=cfg.get("num_stages", 4),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        groups=cfg.get("groups", 32),
        base_width=cfg.get("base_width", 4),
        base_channels=cfg.get("base_channels", 64),
        frozen_stages=cfg.get("frozen_stages", -1),
        dcn=cfg.get("dcn"),
        stage_with_dcn=tuple(
            cfg.get("stage_with_dcn", (False, False, False, False))
        ),
        plugins=tuple(cfg["plugins"]) if cfg.get("plugins") else None,
        conv_cfg=cfg.get("conv_cfg"),
        norm_cfg=cfg.get("norm_cfg"),
        style=cfg.get("style", "pytorch"),
        dtype=dtype,
    )


@BACKBONES.register("Res2Net")
def build_res2net(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.res2net import Res2Net

    return Res2Net(
        depth=cfg.get("depth", 101),
        num_stages=cfg.get("num_stages", 4),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        base_channels=cfg.get("base_channels", 64),
        scales=cfg.get("scales", 4),
        base_width=cfg.get("base_width", 26),
        frozen_stages=cfg.get("frozen_stages", -1),
        dcn=cfg.get("dcn"),
        stage_with_dcn=tuple(
            cfg.get("stage_with_dcn", (False, False, False, False))
        ),
        dtype=dtype,
    )


@BACKBONES.register("DetectoRS_ResNet")
def build_detectors_resnet(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.detectors_resnet import DetectoRSResNet

    return DetectoRSResNet(
        depth=cfg.get("depth", 50),
        base_channels=cfg.get("base_channels", 64),
        sac_stages=tuple(
            cfg.get("stage_with_sac", (False, True, True, True))
            if cfg.get("sac") is not None
            else (False, False, False, False)
        ),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        frozen_stages=cfg.get("frozen_stages", 1),
        norm_eval=cfg.get("norm_eval", True),
        output_img=cfg.get("output_img", False),
        dtype=dtype,
    )


@BACKBONES.register("PyramidVisionTransformer")
def build_pvt(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.pvt import PVT

    return PVT(
        embed_dims=cfg.get("embed_dims", 64),
        num_layers=tuple(cfg.get("num_layers", (3, 4, 6, 3))),
        num_heads=tuple(cfg.get("num_heads", (1, 2, 5, 8))),
        patch_sizes=tuple(cfg.get("patch_sizes", (4, 2, 2, 2))),
        strides=tuple(cfg.get("strides", (4, 2, 2, 2))),
        sr_ratios=tuple(cfg.get("sr_ratios", (8, 4, 2, 1))),
        mlp_ratios=tuple(cfg.get("mlp_ratios", (8, 8, 4, 4))),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        use_abs_pos_embed=cfg.get("use_abs_pos_embed", True),
        use_conv_ffn=cfg.get("use_conv_ffn", False),
        norm_after_stage=cfg.get("norm_after_stage", False),
        pretrain_img_size=cfg.get("pretrain_img_size", 224),
        dtype=dtype,
    )


@BACKBONES.register("PyramidVisionTransformerV2")
def build_pvt_v2(cfg: Dict[str, Any], dtype=jnp.float32):
    cfg = dict(cfg)
    cfg.setdefault("patch_sizes", (7, 3, 3, 3))
    cfg.setdefault("use_abs_pos_embed", False)
    cfg.setdefault("use_conv_ffn", True)
    cfg.setdefault("norm_after_stage", True)
    return build_pvt(cfg, dtype=dtype)


@BACKBONES.register("ResNeSt")
def build_resnest(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.resnest import ResNeSt

    return ResNeSt(
        depth=cfg.get("depth", 50),
        radix=cfg.get("radix", 2),
        stem_channels=cfg.get("stem_channels", 64),
        base_channels=cfg.get("base_channels", 64),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        frozen_stages=cfg.get("frozen_stages", 1),
        norm_eval=cfg.get("norm_eval", True),
        dtype=dtype,
    )


@BACKBONES.register("HRNet")
def build_hrnet(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.hrnet import HRNet

    # accept the mmdet extra=dict(stage2=..., ...) form by matching widths
    arch = cfg.get("arch")
    if arch is None:
        extra = cfg.get("extra", {}) or {}
        base = (extra.get("stage2", {}) or {}).get("num_channels", [32])[0]
        arch = {18: "w18", 32: "w32", 40: "w40"}.get(base, "w32")
    return HRNet(
        arch=arch,
        frozen_stages=cfg.get("frozen_stages", -1),
        norm_eval=cfg.get("norm_eval", True),
        dtype=dtype,
    )


@BACKBONES.register("RegNet")
def build_regnet(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.regnet import RegNet

    arch = cfg.get("arch", "regnetx_3.2gf")
    if isinstance(arch, dict):  # mmdet allows an explicit param dict
        from .models.backbones import regnet as _rn

        name = None
        for k, v in _rn.ARCH_SETTINGS.items():
            if all(abs(v[p_] - arch.get(p_, -1)) < 1e-6 for p_ in v):
                name = k
                break
        arch = name or "regnetx_3.2gf"
    return RegNet(
        arch=arch,
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        frozen_stages=cfg.get("frozen_stages", -1),
        norm_eval=cfg.get("norm_eval", True),
        dtype=dtype,
    )


@BACKBONES.register("MobileNetV2")
def build_mobilenet_v2(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.mobilenet_v2 import MobileNetV2

    return MobileNetV2(
        widen_factor=cfg.get("widen_factor", 1.0),
        out_indices=tuple(cfg.get("out_indices", (1, 2, 4, 7))),
        frozen_stages=cfg.get("frozen_stages", -1),
        norm_eval=cfg.get("norm_eval", True),
        dtype=dtype,
    )


@BACKBONES.register("SwinTransformer")
def build_swin(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.swin import SwinTransformer

    return SwinTransformer(
        embed_dims=cfg.get("embed_dims", 96),
        depths=tuple(cfg.get("depths", (2, 2, 6, 2))),
        num_heads=tuple(cfg.get("num_heads", (3, 6, 12, 24))),
        window_size=cfg.get("window_size", 7),
        patch_size=cfg.get("patch_size", 4),
        mlp_ratio=cfg.get("mlp_ratio", 4.0),
        out_indices=tuple(cfg.get("out_indices", (0, 1, 2, 3))),
        frozen_stages=cfg.get("frozen_stages", -1),
        dtype=dtype,
    )


def build_backbone(cfg: Dict[str, Any], dtype=jnp.float32):
    cfg = copy.deepcopy(cfg)
    return BACKBONES.get(cfg.pop("type"))(cfg, dtype=dtype)


def build_neck(cfg: Dict[str, Any], dtype=jnp.float32):
    cfg = copy.deepcopy(cfg)
    if isinstance(cfg, (list, tuple)):  # stacked necks, e.g. [FPN, BFP]
        from .models.necks.fpn import BFP, FPNWithBFP

        assert len(cfg) == 2 and cfg[1].get("type") == "BFP", cfg
        bfp_cfg = cfg[1]
        return FPNWithBFP(
            fpn=build_neck(cfg[0], dtype=dtype),
            bfp=BFP(
                refine_level=bfp_cfg.get("refine_level", 2),
                refine_type=bfp_cfg.get("refine_type", "non_local"),
                dtype=dtype,
            ),
        )
    t = cfg.pop("type")
    common = dict(
        in_channels=cfg.get("in_channels"),
        out_channels=cfg.get("out_channels", 256),
        num_outs=cfg.get("num_outs", 5),
        start_level=cfg.get("start_level", 0),
        end_level=cfg.get("end_level", -1),
        add_extra_convs=cfg.get("add_extra_convs", False),
        relu_before_extra_convs=cfg.get("relu_before_extra_convs", False),
        no_norm_on_lateral=cfg.get("no_norm_on_lateral", False),
        dtype=dtype,
    )
    if t == "FPN":
        return FPN(**common, norm_cfg=cfg.get("norm_cfg"),
                   conv_cfg=cfg.get("conv_cfg"))
    if t == "SPPFPN":
        from .models.necks.fpn import SPPFPN

        return SPPFPN(**common, norm_cfg=cfg.get("norm_cfg"),
                      spp_type=cfg.get("SPP_type", "ASPP"))
    if t == "PAFPN":
        return PAFPN(**common, norm_cfg=cfg.get("norm_cfg"))
    if t == "FPT":
        from .models.necks.fpt import FPT

        return FPT(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            fpt_rendering=cfg.get("fpt_rendering", True),
            dtype=dtype,
        )
    if t == "FPT_lite":
        from .models.necks.fpt import FPTLite

        return FPTLite(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            start_level=cfg.get("start_level", 0),
            dtype=dtype,
        )
    if t == "NASFCOS_FPN":
        from .models.dense_heads.nasfcos import NASFCOSFPN

        return NASFCOSFPN(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            start_level=cfg.get("start_level", 1),
            dtype=dtype,
        )
    if t == "RFP":
        from .models.necks.fpn import RFP

        bb_cfg = dict(cfg.get("rfp_backbone") or {})
        bb_cfg.pop("pretrained", None)
        bb_cfg.pop("rfp_inplanes", None)
        bb_cfg.setdefault("type", "DetectoRS_ResNet")
        bb_cfg["output_img"] = False
        rfp_bb = build_backbone(bb_cfg, dtype=dtype)
        return RFP(
            in_channels=tuple(cfg.get("in_channels",
                                      (256, 512, 1024, 2048))),
            rfp_backbone=rfp_bb,
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            rfp_steps=cfg.get("rfp_steps", 2),
            aspp_out_channels=cfg.get("aspp_out_channels", 64),
            dtype=dtype,
        )
    if t == "FPG":
        from .models.necks.fpn import FPG

        return FPG(
            out_channels=cfg.get("out_channels", 256),
            inter_channels=cfg.get("inter_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            stack_times=cfg.get("stack_times", 9),
            start_level=cfg.get("start_level", 0),
            skip_inds=tuple(
                tuple(t_) for t_ in cfg.get(
                    "skip_inds",
                    ((0, 1, 2, 3), (0, 1, 2), (0, 1), (0,), ()))
            ),
            dtype=dtype,
        )
    if t == "FPN_CARAFE":
        from .models.necks.fpn import FPNCarafe

        up = cfg.get("upsample_cfg", {}) or {}
        return FPNCarafe(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            start_level=cfg.get("start_level", 0),
            up_kernel=up.get("up_kernel", 5),
            encoder_kernel=up.get("encoder_kernel", 3),
            compressed_channels=up.get("compressed_channels", 64),
            dtype=dtype,
        )
    if t == "NASFPN" or t == "NAS_FPN":
        from .models.necks.fpn import NASFPN

        return NASFPN(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            stack_times=cfg.get("stack_times", 7),
            start_level=cfg.get("start_level", 1),
            dtype=dtype,
        )
    if t == "HRFPN":
        from .models.necks.fpn import HRFPN

        return HRFPN(
            out_channels=cfg.get("out_channels", 256),
            num_outs=cfg.get("num_outs", 5),
            stride=cfg.get("stride", 1),
            dtype=dtype,
        )
    if t == "ChannelMapper":
        return ChannelMapper(
            out_channels=cfg.get("out_channels", 256),
            kernel_size=cfg.get("kernel_size", 1),
            dtype=dtype,
        )
    raise KeyError(t)


def build_anchor_generator(cfg: Dict[str, Any]) -> AnchorGenerator:
    cfg = copy.deepcopy(cfg)
    cfg.pop("type", None)
    return AnchorGenerator(**cfg)


def _coder_params(cfg: Dict[str, Any]):
    return (
        tuple(cfg.get("target_means", (0.0, 0.0, 0.0, 0.0))),
        tuple(cfg.get("target_stds", (1.0, 1.0, 1.0, 1.0))),
    )


def build_rpn(cfg: Dict[str, Any], train_cfg: Dict[str, Any], dtype=jnp.float32):
    """Returns (flax module, head cfg dataclass, rpn_type, anchor_generator)."""
    t = cfg["type"]
    if t not in ("GARPNHead", "CascadeRPNHead"):
        ag = build_anchor_generator(cfg["anchor_generator"])
        num_anchors = len(ag.base_anchors[0])
    means, stds = _coder_params(cfg.get("bbox_coder", {}))
    assigner = (train_cfg or {}).get("assigner", {}) if isinstance(
        train_cfg, dict) or train_cfg is None else {}
    if t == "ATSSRPNHead":
        module = ATSSRPNConvs(
            num_anchors=num_anchors,
            feat_channels=cfg.get("feat_channels", 256),
            stacked_convs=cfg.get("stacked_convs", 4),
            num_levels=len(ag.strides),
            last_conv=cfg.get("last_conv", "norm"),
            dtype=dtype,
        )
        loss_cls = cfg.get("loss_cls", {})
        loss_bbox = cfg.get("loss_bbox", {"type": "IoULoss"})
        head_cfg = ATSSRPNCfg(
            gamma=cfg.get("gamma", 1.0),
            atss=cfg.get("atss", False),
            reg_decoded_bbox=cfg.get("reg_decoded_bbox", True),
            target_means=means,
            target_stds=stds,
            focal_gamma=loss_cls.get("gamma", 2.0),
            focal_alpha=loss_cls.get("alpha", 0.25),
            loss_cls_weight=loss_cls.get("loss_weight", 1.0),
            loss_cls_type="varifocal" if loss_cls.get("type") == "VarifocalLoss" else "focal",
            loss_bbox_weight=loss_bbox.get("loss_weight", 1.0),
            loss_bbox_type=_LOSS_BOX_TYPES.get(loss_bbox.get("type", "IoULoss"), "iou"),
            loss_iou_weight=cfg.get("loss_centerness", {}).get("loss_weight", 1.0),
            with_aug_loss=cfg.get("aug_reg_loss") is not None,
            aug_loss_weight=(cfg.get("aug_reg_loss") or {}).get("loss_weight", 1.0),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
            min_pos_iou=assigner.get("min_pos_iou", 0.0),
            match_low_quality=assigner.get("match_low_quality", True),
        )
        return module, head_cfg, "atss_rpn", ag
    if t == "CascadeRPNHead":
        from .models.dense_heads.cascade_rpn_head import (
            CascadeRPNCfg,
            CascadeRPNConvs,
        )

        stages = cfg.get("stages", [{}, {}])
        s1, s2 = stages[0], stages[-1]
        agc = s1.get("anchor_generator", {})
        ag = build_anchor_generator({
            "type": "AnchorGenerator",
            "scales": agc.get("scales", [8]),
            "ratios": agc.get("ratios", [1.0]),
            "strides": agc.get("strides", [4, 8, 16, 32, 64]),
        })
        tc = train_cfg if isinstance(train_cfg, (list, tuple)) else [
            train_cfg or {}, train_cfg or {}]
        s1_assigner = (tc[0] or {}).get("assigner", {})
        s2_assigner = (tc[-1] or {}).get("assigner", {})
        s2_sampler = (tc[-1] or {}).get("sampler", {})
        _, s1_stds = _coder_params(s1.get("bbox_coder", {}))
        _, s2_stds = _coder_params(s2.get("bbox_coder", {}))
        module = CascadeRPNConvs(
            feat_channels=s1.get("feat_channels", 256), dtype=dtype)
        head_cfg = CascadeRPNCfg(
            strides=tuple(agc.get("strides", (4, 8, 16, 32, 64))),
            anchor_scale=float(agc.get("scales", [8])[0]),
            stage1_stds=s1_stds if s1_stds != (1.0,) * 4
            else (0.1, 0.1, 0.5, 0.5),
            stage2_stds=s2_stds if s2_stds != (1.0,) * 4
            else (0.05, 0.05, 0.1, 0.1),
            center_ratio=(tc[0] or {}).get("center_ratio",
                                           s1_assigner.get("center_ratio",
                                                           0.2)),
            ignore_ratio=(tc[0] or {}).get("ignore_ratio",
                                           s1_assigner.get("ignore_ratio",
                                                           0.5)),
            pos_iou_thr=s2_assigner.get("pos_iou_thr", 0.7),
            neg_iou_thr=s2_assigner.get("neg_iou_thr", 0.7),
            min_pos_iou=s2_assigner.get("min_pos_iou", 0.3),
            num_samples=s2_sampler.get("num", 256),
            pos_fraction=s2_sampler.get("pos_fraction", 0.5),
            loss_bbox_weight=s1.get("loss_bbox", {}).get("loss_weight",
                                                         7.0),
            loss_cls_weight=s2.get("loss_cls", {}).get("loss_weight", 0.7),
        )
        return module, head_cfg, "cascade_rpn", ag
    if t == "GARPNHead":
        from .models.dense_heads.guided_anchor_head import GACfg, GARPNConvs

        approx = cfg.get("approx_anchor_generator", {})
        square = cfg.get("square_anchor_generator", {})
        # the squares come out of the standard generator (1 anchor/loc)
        ag = build_anchor_generator({
            "type": "AnchorGenerator",
            "scales": square.get("scales", [8]),
            "ratios": square.get("ratios", [1.0]),
            "strides": square.get("strides", approx.get(
                "strides", [4, 8, 16, 32, 64])),
        })
        module = GARPNConvs(
            feat_channels=cfg.get("feat_channels", 256),
            deform_groups=cfg.get("deform_groups", 4),
            dtype=dtype,
        )
        a_means, a_stds = _coder_params(cfg.get("anchor_coder", {}))
        ga_assigner = (train_cfg or {}).get("ga_assigner", {})
        ga_sampler = (train_cfg or {}).get("ga_sampler", {})
        sampler = (train_cfg or {}).get("sampler", {})
        loss_loc = cfg.get("loss_loc", {})
        head_cfg = GACfg(
            octave_base_scale=approx.get("octave_base_scale", 8),
            scales_per_octave=approx.get("scales_per_octave", 3),
            ratios=tuple(approx.get("ratios", (0.5, 1.0, 2.0))),
            strides=tuple(approx.get("strides", (4, 8, 16, 32, 64))),
            anchor_coder_stds=a_stds,
            bbox_coder_stds=stds,
            loc_filter_thr=cfg.get("loc_filter_thr", 0.01),
            center_ratio=(train_cfg or {}).get("center_ratio", 0.2),
            ignore_ratio=(train_cfg or {}).get("ignore_ratio", 0.5),
            ga_pos_iou_thr=ga_assigner.get("pos_iou_thr", 0.7),
            ga_neg_iou_thr=ga_assigner.get("neg_iou_thr", 0.3),
            ga_min_pos_iou=ga_assigner.get("min_pos_iou", 0.3),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.7),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.3),
            min_pos_iou=assigner.get("min_pos_iou", 0.3),
            num_samples=sampler.get("num", 256),
            pos_fraction=sampler.get("pos_fraction", 0.5),
            loc_loss_weight=loss_loc.get("loss_weight", 1.0),
            shape_loss_weight=cfg.get("loss_shape", {}).get(
                "loss_weight", 1.0),
            loss_loc_gamma=loss_loc.get("gamma", 2.0),
            loss_loc_alpha=loss_loc.get("alpha", 0.25),
        )
        return module, head_cfg, "ga_rpn", ag
    if t == "RPNHead":
        module = RPNConvs(
            num_anchors=num_anchors,
            feat_channels=cfg.get("feat_channels", 256),
            num_convs=cfg.get("num_convs", 1),
            dtype=dtype,
        )
        sampler = (train_cfg or {}).get("sampler", {})
        head_cfg = RPNCfg(
            target_means=means,
            target_stds=stds,
            pos_iou_thr=assigner.get("pos_iou_thr", 0.7),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.3),
            min_pos_iou=assigner.get("min_pos_iou", 0.3),
            num_samples=sampler.get("num", 256),
            pos_fraction=sampler.get("pos_fraction", 0.5),
            smooth_l1_beta=cfg.get("loss_bbox", {}).get("beta", 1.0 / 9.0),
            loss_cls_weight=cfg.get("loss_cls", {}).get("loss_weight", 1.0),
            loss_bbox_weight=cfg.get("loss_bbox", {}).get("loss_weight", 1.0),
            loss_cls_type=("focal"
                           if cfg.get("loss_cls", {}).get("type")
                           == "FocalLoss" else "bce"),
            focal_gamma=cfg.get("loss_cls", {}).get("gamma", 2.0),
            focal_alpha=cfg.get("loss_cls", {}).get("alpha", 0.25),
        )
        return module, head_cfg, "rpn", ag
    raise KeyError(t)


def _std_convfc_head(cfg, num_classes, dtype):
    # type-name presets (reference convfc_bbox_head.py subclasses)
    presets = {
        "Shared2FCBBoxHead": (0, 2),
        "Shared4Conv1FCBBoxHead": (4, 1),
    }
    n_convs, n_fcs = presets.get(cfg.get("type"), (0, 2))
    return ConvFCBBoxHead(
        num_classes=num_classes,
        num_shared_convs=cfg.get("num_shared_convs", n_convs),
        num_shared_fcs=cfg.get("num_shared_fcs", n_fcs),
        conv_out_channels=cfg.get("conv_out_channels", 256),
        fc_out_channels=cfg.get("fc_out_channels", 1024),
        roi_feat_size=cfg.get("roi_feat_size", 7),
        reg_class_agnostic=cfg.get("reg_class_agnostic", False),
        with_reg=cfg.get("with_reg", True),
        conv_cfg=cfg.get("conv_cfg"),
        norm_cfg=cfg.get("norm_cfg"),
        seesaw=cfg.get("loss_cls", {}).get("type") == "SeesawLoss",
        dtype=dtype,
    )


def build_bbox_head(cfg: Dict[str, Any], dtype=jnp.float32):
    means, stds = _coder_params(cfg.get("bbox_coder", {}))
    num_classes = cfg.get("num_classes", 80)
    if cfg.get("type") == "SABLHead":
        from .models.roi_heads.sabl_head import SABLBBoxHead

        coder = cfg.get("bbox_coder", {})
        module = SABLBBoxHead(
            num_classes=num_classes,
            in_channels=cfg.get("reg_in_channels", 256),
            roi_feat_size=cfg.get("roi_feat_size", 7),
            reg_feat_up_ratio=int(cfg.get("reg_feat_up_ratio", 2)),
            reg_pre_num=cfg.get("reg_pre_num", 2),
            reg_post_num=cfg.get("reg_post_num", 1),
            cls_out_channels=cfg.get("cls_out_channels", 1024),
            num_cls_fcs=cfg.get("num_cls_fcs", 1),
            num_reg_fcs=cfg.get("num_reg_fcs", 0),
            num_buckets=coder.get("num_buckets", 14),
            dtype=dtype,
        )
        head_cfg = BBoxHeadCfg(
            num_classes=num_classes,
            target_means=(0.0,) * 4,
            target_stds=(1.0,) * 4,
            reg_class_agnostic=True,
        )
        return module, head_cfg
    if cfg.get("type") == "DoubleConvFCBBoxHead":
        from .models.roi_heads.bbox_head import DoubleBBoxHead

        module = DoubleBBoxHead(
            num_classes=num_classes,
            num_convs=cfg.get("num_convs", 4),
            num_fcs=cfg.get("num_fcs", 2),
            conv_out_channels=cfg.get("conv_out_channels", 1024),
            fc_out_channels=cfg.get("fc_out_channels", 1024),
            reg_class_agnostic=cfg.get("reg_class_agnostic", False),
            dtype=dtype,
        )
    else:
        module = _std_convfc_head(cfg, num_classes, dtype)
    loss_bbox = cfg.get("loss_bbox", {"type": "L1Loss"})
    head_cfg = BBoxHeadCfg(
        num_classes=num_classes,
        target_means=means,
        target_stds=stds,
        reg_class_agnostic=cfg.get("reg_class_agnostic", False),
        reg_decoded_bbox=cfg.get("reg_decoded_bbox", False),
        loss_cls_weight=cfg.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=loss_bbox.get("loss_weight", 1.0),
        loss_bbox_type=_LOSS_BOX_TYPES.get(loss_bbox.get("type", "L1Loss"), "l1"),
        smooth_l1_beta=loss_bbox.get("beta", 1.0),
        focal_reg=cfg.get("focal_reg", False),
        focal_reg_gamma=cfg.get("gamma", 1.0),
        # Seesaw (configs/seesaw_loss): stateful cumulative counts in the
        # head's batch_stats; see BBoxHeadCfg docstring for the deviation
        loss_cls_type=("seesaw"
                       if cfg.get("loss_cls", {}).get("type") == "SeesawLoss"
                       else "ce"),
        seesaw_p=cfg.get("loss_cls", {}).get("p", 0.8),
        seesaw_q=cfg.get("loss_cls", {}).get("q", 2.0),
    )
    return module, head_cfg


def build_single_stage(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.dense_heads.atss_head import ATSSCfg, ATSSConvs
    from .models.dense_heads.retina_head import RetinaCfg, RetinaConvs
    from .models.detectors.single_stage import (
        SingleStageDetector,
        SingleStageNet,
        SSTestCfg,
    )

    t = model_cfg["type"]
    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    ag = build_anchor_generator(head["anchor_generator"])
    num_anchors = len(ag.base_anchors[0])
    means, stds = _coder_params(head.get("bbox_coder", {}))
    num_classes = head.get("num_classes", 80)
    loss_cls = head.get("loss_cls", {})
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    train_cfg = model_cfg.get("train_cfg") or {}
    assigner = train_cfg.get("assigner", {})
    if t == "ATSS" or head.get("type") == "ATSSHead":
        module = ATSSConvs(
            num_classes=num_classes,
            num_anchors=num_anchors,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            num_levels=len(ag.strides),
            dtype=dtype,
        )
        hc = ATSSCfg(
            num_classes=num_classes,
            target_means=means,
            target_stds=stds,
            topk=assigner.get("topk", 9),
            focal_gamma=loss_cls.get("gamma", 2.0),
            focal_alpha=loss_cls.get("alpha", 0.25),
            loss_cls_weight=loss_cls.get("loss_weight", 1.0),
            loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 2.0),
        )
        head_type = "atss"
    else:
        loss_bbox = head.get("loss_bbox", {})
        is_ghmc = loss_cls.get("type") == "GHMC"
        is_ghmr = loss_bbox.get("type") == "GHMR"
        ghm_c_mmt = loss_cls.get("momentum", 0.0) if is_ghmc else 0.0
        ghm_r_mmt = loss_bbox.get("momentum", 0.0) if is_ghmr else 0.0
        module = RetinaConvs(
            num_classes=num_classes,
            num_anchors=num_anchors,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            sep_bn=(head.get("type") == "RetinaSepBNHead"),
            # momentum>0 -> EMA acc_sum buffers declared in batch_stats
            # (reference GHMC/GHMR registered buffers, ghm_loss.py:52,150)
            ghm_c_state_bins=(loss_cls.get("bins", 10)
                              if ghm_c_mmt > 0 else 0),
            ghm_r_state_bins=(loss_bbox.get("bins", 10)
                              if ghm_r_mmt > 0 else 0),
            dtype=dtype,
        )
        hc = RetinaCfg(
            num_classes=num_classes,
            target_means=means,
            target_stds=stds,
            focal_gamma=loss_cls.get("gamma", 2.0),
            focal_alpha=loss_cls.get("alpha", 0.25),
            loss_cls_weight=loss_cls.get("loss_weight", 1.0),
            loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 1.0),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.4),
            smooth_l1_beta=head.get("loss_bbox", {}).get("beta", 0.0),
            # GHM variants (configs/ghm); momentum>0 = the reference's EMA
            # acc_sum buffers, held in batch_stats by RetinaConvs
            loss_cls_type="ghm" if is_ghmc else "focal",
            ghm_bins=loss_cls.get("bins", 30),
            ghm_momentum=ghm_c_mmt,
            loss_bbox_type="ghmr" if is_ghmr else "l1",
            ghmr_mu=loss_bbox.get("mu", 0.02),
            ghmr_bins=loss_bbox.get("bins", 10),
            ghmr_momentum=ghm_r_mmt,
            pisa=(head.get("type") == "PISARetinaHead"
                  or train_cfg.get("isr") is not None),
            isr_k=(train_cfg.get("isr") or {}).get("k", 2.0),
            isr_bias=(train_cfg.get("isr") or {}).get("bias", 0.0),
            carl_k=(train_cfg.get("carl") or {}).get("k", 1.0),
            carl_bias=(train_cfg.get("carl") or {}).get("bias", 0.2),
        )
        head_type = "retina"
    net = SingleStageNet(backbone=backbone, neck=neck, head=module)
    return SingleStageDetector(
        net,
        ag,
        head_cfg=hc,
        head_type=head_type,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_cascade(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.detectors.cascade import CascadeDetector, CascadeNet
    from .models.roi_heads.cascade_roi_head import CascadeCfg

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
        model_cfg["rpn_head"], train_cfg.get("rpn", {}), dtype=dtype
    )
    roi = model_cfg["roi_head"]
    head_cfgs_list = roi["bbox_head"]
    if isinstance(head_cfgs_list, dict):
        head_cfgs_list = [head_cfgs_list] * roi.get("num_stages", 3)
    modules, bbox_cfgs = [], []
    for hcfg in head_cfgs_list:
        m, bc = build_bbox_head(hcfg, dtype=dtype)
        modules.append(m)
        bbox_cfgs.append(bc)
    extractor = roi.get("bbox_roi_extractor", {})
    strides = tuple(extractor.get("featmap_strides", (4, 8, 16, 32)))
    net = CascadeNet(
        backbone=backbone,
        neck=neck,
        rpn=rpn_module,
        bbox_heads=tuple(modules),
        roi_strides=strides,
        roi_finest_scale=extractor.get("finest_scale", 56),
    )
    rcnn_cfgs = train_cfg.get("rcnn", [])
    if isinstance(rcnn_cfgs, dict):
        rcnn_cfgs = [rcnn_cfgs]
    # one threshold per stage; defaults follow the reference ladder
    # (0.5, 0.6, 0.7, 0.8, ... — cascade_rcnn_s4 runs 4 stages)
    _ns = roi.get("num_stages", 3)
    stage_pos = tuple(
        (rcnn_cfgs[i] if i < len(rcnn_cfgs) else {})
        .get("assigner", {})
        .get("pos_iou_thr", min(0.5 + 0.1 * i, 0.9))
        for i in range(_ns)
    )
    sampler = (rcnn_cfgs[0] if rcnn_cfgs else {}).get("sampler", {})
    roi_cfg = ProbRoICfg(
        boost=roi.get("boost", False),
        prob=roi.get("type") == "ProbCascadeRoIHead",
        gamma=roi.get("gamma", 0.1),
        num_samples=sampler.get("num", 512),
        pos_fraction=sampler.get("pos_fraction", 0.25),
        add_gt_as_proposals=sampler.get("add_gt_as_proposals", True),
    )
    cascade_cfg = CascadeCfg(
        num_stages=roi.get("num_stages", 3),
        stage_loss_weights=tuple(roi.get("stage_loss_weights", (1.0, 0.5, 0.25))),
        stage_pos_iou=stage_pos,
        prob=roi.get("type") == "ProbCascadeRoIHead",
        boost=roi.get("boost", False),
        gamma=roi.get("gamma", 0.1),
    )
    rpn_prop = train_cfg.get("rpn_proposal", {})
    rpn_test = test_cfg.get("rpn", {})
    rcnn_test = test_cfg.get("rcnn", {})
    det_cls = CascadeDetector
    det_kwargs = {}
    if head_cfgs_list[0].get("type") == "SABLHead":
        # SABL cascade (configs/sabl/sabl_cascade_rcnn_*): bucketing
        # stage losses + bucket2bbox between-stage refinement
        from .models.roi_heads.sabl_head import make_sabl_cascade_class

        coder = head_cfgs_list[0].get("bbox_coder", {})
        det_cls = make_sabl_cascade_class()
        det_kwargs = dict(
            num_buckets=coder.get("num_buckets", 14),
            bucket_scale_factor=coder.get("scale_factor", 1.7),
        )
    return det_cls(
        net,
        ag,
        rpn_cfg=rpn_cfg,
        roi_cfg=roi_cfg,
        bbox_cfg=bbox_cfgs[0],
        train_proposal_cfg=ProposalCfg(
            nms_pre=rpn_prop.get("nms_pre", 2000),
            approx_topk=rpn_prop.get("approx_topk", False),
            topk_recall_target=rpn_prop.get("topk_recall_target", 0.95),
            max_per_img=rpn_prop.get("max_per_img", 1000),
            nms_iou_thr=rpn_prop.get("nms", {}).get("iou_threshold", 0.7),
        ),
        test_proposal_cfg=ProposalCfg(
            nms_pre=rpn_test.get("nms_pre", 1000),
            approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
            max_per_img=rpn_test.get("max_per_img", 1000),
            nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
        ),
        rcnn_test_cfg=RCNNTestCfg(
            score_thr=rcnn_test.get("score_thr", 0.05),
            nms_iou_thr=rcnn_test.get("nms", {}).get("iou_threshold", 0.5),
            nms_type=rcnn_test.get("nms", {}).get("type", "nms"),
            max_per_img=rcnn_test.get("max_per_img", 100),
            pre_nms_top_k=rcnn_test.get("pre_nms_top_k", 2048),
        ),
        rpn_type=rpn_type,
        cascade_cfg=cascade_cfg,
        **det_kwargs,
    )




def build_ga_retinanet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """GA-RetinaNet (reference configs/guided_anchoring/ga_retinanet_*)."""
    from .models.dense_heads.guided_anchor_head import GACfg, GARetinaConvs
    from .models.detectors.single_stage import (
        GARetinaDetector,
        SingleStageNet,
        SSTestCfg,
    )

    test_cfg = model_cfg.get("test_cfg") or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    head = model_cfg["bbox_head"]
    approx = head.get("approx_anchor_generator", {})
    _, a_stds = _coder_params(head.get("anchor_coder", {}))
    _, b_stds = _coder_params(head.get("bbox_coder", {}))
    ga_assigner = train_cfg.get("ga_assigner", {})
    assigner = train_cfg.get("assigner", {})
    loss_loc = head.get("loss_loc", {})
    cfg = GACfg(
        octave_base_scale=approx.get("octave_base_scale", 4),
        scales_per_octave=approx.get("scales_per_octave", 3),
        ratios=tuple(approx.get("ratios", (0.5, 1.0, 2.0))),
        strides=tuple(approx.get("strides", (8, 16, 32, 64, 128))),
        anchor_coder_stds=a_stds,
        bbox_coder_stds=b_stds,
        loc_filter_thr=head.get("loc_filter_thr", 0.01),
        center_ratio=train_cfg.get("center_ratio", 0.2),
        ignore_ratio=train_cfg.get("ignore_ratio", 0.5),
        ga_pos_iou_thr=ga_assigner.get("pos_iou_thr", 0.5),
        ga_neg_iou_thr=ga_assigner.get("neg_iou_thr", 0.4),
        ga_min_pos_iou=ga_assigner.get("min_pos_iou", 0.4),
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
        min_pos_iou=assigner.get("min_pos_iou", 0.0),
        loc_loss_weight=loss_loc.get("loss_weight", 1.0),
        shape_loss_weight=head.get("loss_shape", {}).get("loss_weight",
                                                         1.0),
    )
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=GARetinaConvs(
            num_classes=head.get("num_classes", 80),
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            deform_groups=head.get("deform_groups", 4),
            dtype=dtype,
        ),
    )
    nms = test_cfg.get("nms", {})
    return GARetinaDetector(
        net, cfg, num_classes=head.get("num_classes", 80),
        smooth_l1_beta=head.get("loss_bbox", {}).get("beta", 0.04),
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=nms.get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_sabl_retinanet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """SABL RetinaNet (reference ``configs/sabl``)."""
    from .models.dense_heads.sabl_head import SABLCfg, SABLRetinaConvs
    from .models.detectors.single_stage import (
        SABLDetector,
        SingleStageNet,
        SSTestCfg,
    )

    test_cfg = model_cfg.get("test_cfg") or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    head = model_cfg["bbox_head"]
    approx = head.get("approx_anchor_generator", {})
    coder = head.get("bbox_coder", {})
    assigner = train_cfg.get("assigner", {})
    cfg = SABLCfg(
        num_classes=head.get("num_classes", 80),
        num_buckets=coder.get("num_buckets", 14),
        bucket_scale_factor=coder.get("scale_factor", 3.0),
        offset_topk=coder.get("offset_topk", 2),
        octave_base_scale=approx.get("octave_base_scale", 4),
        scales_per_octave=approx.get("scales_per_octave", 3),
        ratios=tuple(approx.get("ratios", (0.5, 1.0, 2.0))),
        strides=tuple(approx.get("strides", (8, 16, 32, 64, 128))),
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.4),
        min_pos_iou=assigner.get("min_pos_iou", 0.0),
        loss_cls_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_cls_weight=head.get("loss_bbox_cls", {}).get(
            "loss_weight", 1.5),
        loss_bbox_reg_weight=head.get("loss_bbox_reg", {}).get(
            "loss_weight", 1.5),
        smooth_l1_beta=head.get("loss_bbox_reg", {}).get("beta", 1.0 / 9.0),
    )
    net = SingleStageNet(
        backbone=backbone,
        neck=neck,
        head=SABLRetinaConvs(
            num_classes=cfg.num_classes,
            side_num=cfg.side_num,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            dtype=dtype,
        ),
    )
    nms = test_cfg.get("nms", {})
    return SABLDetector(
        net, cfg,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=nms.get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_yolact(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """YOLACT (reference ``detectors/yolact.py`` + ``yolact_head.py``)."""
    from .models.dense_heads.ssd_head import SSDCfg
    from .models.detectors.yolact import (
        YOLACTCfg,
        YOLACTDetector,
        YOLACTHeadConvs,
        YOLACTNet,
        YOLACTProtonet,
        YOLACTSegmHead,
    )

    head = model_cfg["bbox_head"]
    mask_head = model_cfg.get("mask_head", {}) or {}
    segm_head = model_cfg.get("segm_head", {}) or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    ag = build_anchor_generator(head["anchor_generator"])
    num_anchors = len(ag.base_anchors[0])
    means, stds = _coder_params(head.get("bbox_coder", {}))
    num_classes = head.get("num_classes", 80)
    assigner = train_cfg.get("assigner", {})
    ssd_cfg = SSDCfg(
        num_classes=num_classes,
        target_means=means,
        target_stds=stds,
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.4),
        min_pos_iou=assigner.get("min_pos_iou", 0.0),
        neg_pos_ratio=train_cfg.get("sampler", {}).get(
            "neg_pos_ratio", 3),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 1.5),
        smooth_l1_beta=head.get("loss_bbox", {}).get("beta", 1.0),
    )
    cfg = YOLACTCfg(
        num_classes=num_classes,
        num_protos=head.get("num_protos", 32),
        max_masks_to_train=mask_head.get("max_masks_to_train", 100),
        loss_mask_weight=mask_head.get("loss_mask_weight", 1.0),
        score_thr=test_cfg.get("score_thr", 0.05),
        iou_thr=test_cfg.get("iou_thr", 0.5),
        top_k=test_cfg.get("top_k", 200),
        max_per_img=test_cfg.get("max_per_img", 100),
    )
    net = YOLACTNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=YOLACTHeadConvs(
            num_classes=num_classes,
            num_anchors=num_anchors,
            num_protos=cfg.num_protos,
            feat_channels=head.get("feat_channels", 256),
            num_head_convs=head.get("num_head_convs", 1),
            dtype=dtype,
        ),
        protonet=YOLACTProtonet(
            num_protos=cfg.num_protos,
            channels=mask_head.get("proto_channels", [256])[0]
            if isinstance(mask_head.get("proto_channels"), (list, tuple))
            else 256,
            dtype=dtype,
        ),
        segm_head=YOLACTSegmHead(num_classes=num_classes, dtype=dtype),
    )
    return YOLACTDetector(net, ag, ssd_cfg, cfg)


def build_trident(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """TridentNet (reference ``detectors/trident_faster_rcnn.py``): C4
    Faster R-CNN over a branch-folded trident backbone."""
    from flax import linen as nn

    from .models.backbones.trident_resnet import TridentResNet
    from .models.detectors.trident import Res5BBoxHead, TridentFasterRCNN

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    bb = model_cfg["backbone"]
    backbone = TridentResNet(
        depth=bb.get("depth", 50),
        base_channels=bb.get("base_channels", 64),
        trident_dilations=tuple(bb.get("trident_dilations", (1, 2, 3))),
        test_branch_idx=bb.get("test_branch_idx", 1),
        frozen_stages=bb.get("frozen_stages", 1),
        dtype=dtype,
    )

    class _IdentityNeck(nn.Module):
        def __call__(self, x):
            return x

    rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
        model_cfg["rpn_head"], train_cfg.get("rpn", {}), dtype=dtype
    )
    roi = model_cfg["roi_head"]
    bhc = roi.get("bbox_head", {})
    means, stds = _coder_params(bhc.get("bbox_coder", {}))
    num_classes = bhc.get("num_classes", 80)
    bbox_module = Res5BBoxHead(
        num_classes=num_classes,
        reg_class_agnostic=bhc.get("reg_class_agnostic", False),
        dtype=dtype,
    )
    bbox_cfg = BBoxHeadCfg(
        num_classes=num_classes,
        target_means=means,
        target_stds=stds,
        reg_class_agnostic=bhc.get("reg_class_agnostic", False),
        loss_cls_weight=bhc.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=bhc.get("loss_bbox", {}).get("loss_weight", 1.0),
    )
    net = TwoStageNet(
        backbone=backbone,
        neck=_IdentityNeck(),
        rpn=rpn_module,
        bbox_head=bbox_module,
        roi_strides=(16,),
        roi_out_size=14,
    )
    rcnn_train = train_cfg.get("rcnn", {})
    sampler = rcnn_train.get("sampler", {})
    assigner = rcnn_train.get("assigner", {})
    roi_cfg = ProbRoICfg(
        num_samples=sampler.get("num", 128),
        pos_fraction=sampler.get("pos_fraction", 0.5),
        add_gt_as_proposals=sampler.get("add_gt_as_proposals", False),
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
        min_pos_iou=assigner.get("min_pos_iou", 0.5),
    )
    rpn_prop = train_cfg.get("rpn_proposal", {})
    rpn_test = test_cfg.get("rpn", {})
    rcnn_test = test_cfg.get("rcnn", {})
    det = TridentFasterRCNN(
        net,
        ag,
        rpn_cfg=rpn_cfg,
        roi_cfg=roi_cfg,
        bbox_cfg=bbox_cfg,
        train_proposal_cfg=ProposalCfg(
            nms_pre=rpn_prop.get("nms_pre", 2000),
            approx_topk=rpn_prop.get("approx_topk", False),
            topk_recall_target=rpn_prop.get("topk_recall_target", 0.95),
            max_per_img=rpn_prop.get("max_per_img", 500),
            nms_iou_thr=rpn_prop.get("nms", {}).get("iou_threshold", 0.7),
        ),
        test_proposal_cfg=ProposalCfg(
            nms_pre=rpn_test.get("nms_pre", 1000),
            approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
            max_per_img=rpn_test.get("max_per_img", 300),
            nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
        ),
        rcnn_test_cfg=RCNNTestCfg(
            score_thr=rcnn_test.get("score_thr", 0.05),
            nms_iou_thr=rcnn_test.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=rcnn_test.get("max_per_img", 100),
        ),
        rpn_type=rpn_type,
    )
    det.num_branch = len(bb.get("trident_dilations", (1, 2, 3)))
    det.test_branch_idx = bb.get("test_branch_idx", 1)
    return det


def build_scnet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """SCNet (reference ``detectors/scnet.py`` + ``scnet_roi_head.py``)."""
    from .models.detectors.scnet import (
        FeatureRelayHead,
        GlobalContextHead,
        SCNetBBoxHead,
        SCNetDetector,
        SCNetNet,
    )
    from .models.roi_heads.cascade_roi_head import CascadeCfg
    from .models.roi_heads.mask_head import FCNMaskHead, FusedSemanticHead

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
        model_cfg["rpn_head"], train_cfg.get("rpn", {}), dtype=dtype
    )
    roi = model_cfg["roi_head"]
    num_stages = roi.get("num_stages", 3)
    head_cfgs_list = roi["bbox_head"]
    if isinstance(head_cfgs_list, dict):
        head_cfgs_list = [head_cfgs_list] * num_stages
    modules, bbox_cfgs = [], []
    for hcfg in head_cfgs_list:
        _, bc = build_bbox_head(hcfg, dtype=dtype)
        modules.append(SCNetBBoxHead(
            num_classes=bc.num_classes,
            fc_out_channels=hcfg.get("fc_out_channels", 1024),
            reg_class_agnostic=bc.reg_class_agnostic,
            dtype=dtype,
        ))
        bbox_cfgs.append(bc)
    mh = roi.get("mask_head") or {}
    mask_heads = ()
    if mh:
        mask_heads = (FCNMaskHead(
            num_classes=mh.get("num_classes", bbox_cfgs[0].num_classes),
            num_convs=mh.get("num_convs", 4),
            conv_channels=mh.get("conv_out_channels", 256),
            norm_cfg=mh.get("norm_cfg"),
            dtype=dtype,
        ),)
    semantic = None
    sem_cfg = roi.get("semantic_head")
    if sem_cfg:
        semantic = FusedSemanticHead(
            num_classes=sem_cfg.get("num_classes", 183),
            fusion_level=sem_cfg.get("fusion_level", 1),
            num_convs=sem_cfg.get("num_convs", 4),
            channels=sem_cfg.get("conv_out_channels", 256),
            dtype=dtype,
        )
    glb = None
    glb_cfg = roi.get("glbctx_head")
    if glb_cfg:
        glb = GlobalContextHead(
            num_classes=glb_cfg.get("num_classes",
                                    bbox_cfgs[0].num_classes),
            num_convs=glb_cfg.get("num_convs", 4),
            channels=glb_cfg.get("conv_out_channels", 256),
            dtype=dtype,
        )
    relay = None
    if roi.get("feat_relay_head") is not None or mask_heads:
        fr = roi.get("feat_relay_head") or {}
        relay = FeatureRelayHead(
            out_channels=fr.get("out_conv_channels", 256),
            roi_feat_size=fr.get("roi_feat_size", 7),
            scale_factor=fr.get("scale_factor", 2),
            dtype=dtype,
        )
    extractor = roi.get("bbox_roi_extractor", {})
    strides = tuple(extractor.get("featmap_strides", (4, 8, 16, 32)))
    net = SCNetNet(
        backbone=backbone,
        neck=neck,
        rpn=rpn_module,
        bbox_heads=tuple(modules),
        mask_heads=mask_heads,
        semantic_head=semantic,
        glbctx_head=glb,
        feat_relay_head=relay,
        roi_strides=strides,
        roi_finest_scale=extractor.get("finest_scale", 56),
        semantic_stride=roi.get("semantic_roi_extractor", {}).get(
            "featmap_strides", [8]
        )[0],
    )
    rcnn_cfgs = train_cfg.get("rcnn", [])
    if isinstance(rcnn_cfgs, dict):
        rcnn_cfgs = [rcnn_cfgs]
    stage_pos = tuple(
        rc.get("assigner", {}).get("pos_iou_thr", thr)
        for rc, thr in zip(rcnn_cfgs + [{}] * 3, (0.5, 0.6, 0.7))
    )[:num_stages]
    sampler = (rcnn_cfgs[0] if rcnn_cfgs else {}).get("sampler", {})
    roi_cfg = ProbRoICfg(
        num_samples=sampler.get("num", 512),
        pos_fraction=sampler.get("pos_fraction", 0.25),
        add_gt_as_proposals=sampler.get("add_gt_as_proposals", True),
    )
    cascade_cfg = CascadeCfg(
        num_stages=num_stages,
        stage_loss_weights=tuple(
            roi.get("stage_loss_weights", (1.0, 0.5, 0.25))
        ),
        stage_pos_iou=stage_pos,
    )
    rpn_prop = train_cfg.get("rpn_proposal", {})
    rpn_test = test_cfg.get("rpn", {})
    rcnn_test = test_cfg.get("rcnn", {})
    det = SCNetDetector(
        net,
        ag,
        rpn_cfg=rpn_cfg,
        roi_cfg=roi_cfg,
        bbox_cfg=bbox_cfgs[0],
        train_proposal_cfg=ProposalCfg(
            nms_pre=rpn_prop.get("nms_pre", 2000),
            approx_topk=rpn_prop.get("approx_topk", False),
            topk_recall_target=rpn_prop.get("topk_recall_target", 0.95),
            max_per_img=rpn_prop.get("max_per_img", 1000),
            nms_iou_thr=rpn_prop.get("nms", {}).get("iou_threshold", 0.7),
            min_bbox_size=rpn_prop.get("min_bbox_size", 0),
        ),
        test_proposal_cfg=ProposalCfg(
            nms_pre=rpn_test.get("nms_pre", 1000),
            approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
            max_per_img=rpn_test.get("max_per_img", 300),
            nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
            min_bbox_size=rpn_test.get("min_bbox_size", 0),
        ),
        rcnn_test_cfg=RCNNTestCfg(
            score_thr=rcnn_test.get("score_thr", 0.05),
            nms_iou_thr=rcnn_test.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=rcnn_test.get("max_per_img", 100),
        ),
        rpn_type=rpn_type,
        cascade_cfg=cascade_cfg,
    )
    det.glbctx_loss_weight = (glb_cfg or {}).get("loss_weight", 3.0)
    return det


def build_htc(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """HybridTaskCascade (reference ``detectors/htc.py`` +
    ``roi_heads/htc_roi_head.py``): cascade bbox heads + per-stage HTC mask
    heads with info flow + optional fused semantic branch."""
    from .models.detectors.htc import HTCDetector, HTCNet
    from .models.roi_heads.cascade_roi_head import CascadeCfg
    from .models.roi_heads.mask_head import FusedSemanticHead, HTCMaskHead

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
        model_cfg["rpn_head"], train_cfg.get("rpn", {}), dtype=dtype
    )
    roi = model_cfg["roi_head"]
    num_stages = roi.get("num_stages", 3)
    head_cfgs_list = roi["bbox_head"]
    if isinstance(head_cfgs_list, dict):
        head_cfgs_list = [head_cfgs_list] * num_stages
    modules, bbox_cfgs = [], []
    for hcfg in head_cfgs_list:
        m, bc = build_bbox_head(hcfg, dtype=dtype)
        modules.append(m)
        bbox_cfgs.append(bc)
    # HybridTaskCascade: interleaved + info-flow by default; a plain
    # CascadeRCNN with a mask head (the cascade_mask_rcnn family) gets
    # independent per-stage FCN heads on the stage's own sampled rois
    # (reference ``cascade_roi_head.py`` vs ``htc_roi_head.py``)
    is_htc = model_cfg.get("type") in ("HybridTaskCascade", "HTC")
    interleaved = roi.get("interleaved", is_htc)
    mask_info_flow = roi.get("mask_info_flow", is_htc)
    mask_list = roi.get("mask_head", [])
    if isinstance(mask_list, dict):
        mask_list = [mask_list] * num_stages
    mask_heads = tuple(
        HTCMaskHead(
            num_classes=mh.get("num_classes", bbox_cfgs[0].num_classes),
            num_convs=mh.get("num_convs", 4),
            conv_channels=mh.get("conv_out_channels", 256),
            with_conv_res=(mh.get("with_conv_res", True) and mask_info_flow
                           and mh.get("type", "HTCMaskHead") == "HTCMaskHead"),
            predictor_cfg=mh.get("predictor_cfg"),
            dtype=dtype,
        )
        for mh in mask_list
    )
    semantic = None
    sem_cfg = roi.get("semantic_head")
    if sem_cfg:
        semantic = FusedSemanticHead(
            num_classes=sem_cfg.get("num_classes", 183),
            fusion_level=sem_cfg.get("fusion_level", 1),
            num_convs=sem_cfg.get("num_convs", 4),
            channels=sem_cfg.get("conv_out_channels", 256),
            dtype=dtype,
        )
    extractor = roi.get("bbox_roi_extractor", {})
    strides = tuple(extractor.get("featmap_strides", (4, 8, 16, 32)))
    net = HTCNet(
        backbone=backbone,
        neck=neck,
        rpn=rpn_module,
        bbox_heads=tuple(modules),
        mask_heads=mask_heads,
        semantic_head=semantic,
        mask_info_flow=mask_info_flow,
        roi_strides=strides,
        roi_finest_scale=extractor.get("finest_scale", 56),
        semantic_stride=roi.get("semantic_roi_extractor", {}).get(
            "featmap_strides", [8]
        )[0],
    )
    rcnn_cfgs = train_cfg.get("rcnn", [])
    if isinstance(rcnn_cfgs, dict):
        rcnn_cfgs = [rcnn_cfgs]
    stage_pos = tuple(
        rc.get("assigner", {}).get("pos_iou_thr", thr)
        for rc, thr in zip(rcnn_cfgs + [{}] * 3, (0.5, 0.6, 0.7))
    )[:num_stages]
    sampler = (rcnn_cfgs[0] if rcnn_cfgs else {}).get("sampler", {})
    roi_cfg = ProbRoICfg(
        num_samples=sampler.get("num", 512),
        pos_fraction=sampler.get("pos_fraction", 0.25),
        add_gt_as_proposals=sampler.get("add_gt_as_proposals", True),
    )
    cascade_cfg = CascadeCfg(
        num_stages=num_stages,
        stage_loss_weights=tuple(
            roi.get("stage_loss_weights", (1.0, 0.5, 0.25))
        ),
        stage_pos_iou=stage_pos,
        interleaved=interleaved,
    )
    rpn_prop = train_cfg.get("rpn_proposal", {})
    rpn_test = test_cfg.get("rpn", {})
    rcnn_test = test_cfg.get("rcnn", {})
    return HTCDetector(
        net,
        ag,
        rpn_cfg=rpn_cfg,
        roi_cfg=roi_cfg,
        bbox_cfg=bbox_cfgs[0],
        train_proposal_cfg=ProposalCfg(
            nms_pre=rpn_prop.get("nms_pre", 2000),
            approx_topk=rpn_prop.get("approx_topk", False),
            topk_recall_target=rpn_prop.get("topk_recall_target", 0.95),
            max_per_img=rpn_prop.get("max_per_img", 1000),
            nms_iou_thr=rpn_prop.get("nms", {}).get("iou_threshold", 0.7),
        ),
        test_proposal_cfg=ProposalCfg(
            nms_pre=rpn_test.get("nms_pre", 1000),
            approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
            max_per_img=rpn_test.get("max_per_img", 1000),
            nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
        ),
        rcnn_test_cfg=RCNNTestCfg(
            score_thr=rcnn_test.get("score_thr", 0.05),
            nms_iou_thr=rcnn_test.get("nms", {}).get("iou_threshold", 0.5),
            nms_type=rcnn_test.get("nms", {}).get("type", "nms"),
            max_per_img=rcnn_test.get("max_per_img", 100),
        ),
        rpn_type=rpn_type,
        cascade_cfg=cascade_cfg,
    )




def build_solo(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """SOLO (reference ``detectors/solo.py`` + ``solo_head.py``)."""
    from .models.dense_heads.solo_head import SOLOCfg, SOLOHeadConvs
    from .models.detectors.solo import SOLODetector, SOLONet

    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    h = model_cfg["mask_head"]
    num_grids = tuple(h.get("num_grids", (40, 36, 24, 16, 12)))
    head = SOLOHeadConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=h.get("feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 4),
        num_grids=num_grids,
        cls_down_index=h.get("cls_down_index", 0),
        decoupled=h.get("type", "SOLOHead") in (
            "DecoupledSOLOHead", "DecoupledSOLOLightHead"),
        decoupled_light=h.get("type", "SOLOHead")
        == "DecoupledSOLOLightHead",
        dtype=dtype,
    )
    cfg = SOLOCfg(
        num_classes=h.get("num_classes", 80),
        num_grids=num_grids,
        strides=tuple(h.get("strides", (8, 8, 16, 32, 32))),
        scale_ranges=tuple(
            tuple(r) for r in h.get(
                "scale_ranges",
                ((1, 96), (48, 192), (96, 384), (192, 768), (384, 2048)),
            )
        ),
        pos_scale=h.get("pos_scale", 0.2),
        score_thr=test_cfg.get("score_thr", 0.1),
        mask_thr=test_cfg.get("mask_thr", 0.5),
        max_per_img=test_cfg.get("max_per_img", 100),
        nms_sigma=test_cfg.get("nms", {}).get("sigma", 2.0)
        if isinstance(test_cfg.get("nms"), dict) else 2.0,
        filter_thr=test_cfg.get("filter_thr", 0.05),
    )
    net = SOLONet(backbone=backbone, neck=neck, head=head)
    return SOLODetector(net, cfg)




def build_vfnet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """VarifocalNet (reference ``dense_heads/vfnet_head.py:20``)."""
    from .models.dense_heads.vfnet_head import VFNetCfg, VFNetConvs
    from .models.detectors.single_stage import (
        SingleStageNet,
        SSTestCfg,
        VFNetDetector,
    )

    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    h = model_cfg["bbox_head"]
    strides = tuple(h.get("strides", (8, 16, 32, 64, 128)))
    rr = h.get(
        "regress_ranges",
        ((-1, 64), (64, 128), (128, 256), (256, 512), (512, 100000000)),
    )
    reg_denoms = [r[1] for r in rr]
    reg_denoms[-1] = reg_denoms[-2] * 2
    head = VFNetConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=h.get("feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 3),
        num_levels=len(strides),
        strides=strides,
        reg_denoms=tuple(reg_denoms),
        gradient_mul=h.get("gradient_mul", 0.1),
        dtype=dtype,
    )
    cfg = VFNetCfg(
        num_classes=h.get("num_classes", 80),
        strides=strides,
        anchor_scale=h.get("anchor_generator", {}).get(
            "octave_base_scale", 8
        ),
        atss_topk=(model_cfg.get("train_cfg") or {}).get(
            "assigner", {}
        ).get("topk", 9),
        loss_bbox_weight=h.get("loss_bbox", {}).get("loss_weight", 1.5),
        loss_bbox_refine_weight=h.get("loss_bbox_refine", {}).get(
            "loss_weight", 2.0
        ),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=head)
    return VFNetDetector(
        net, cfg,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_fsaf(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """FSAF (reference ``dense_heads/fsaf_head.py:15``)."""
    from .models.dense_heads.fsaf_head import FSAFCfg, FSAFConvs
    from .models.detectors.single_stage import (
        FSAFDetector,
        SingleStageNet,
        SSTestCfg,
    )

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    h = model_cfg["bbox_head"]
    ag = build_anchor_generator(h["anchor_generator"])
    head = FSAFConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=h.get("feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 4),
        dtype=dtype,
    )
    assigner = train_cfg.get("assigner", {})
    cfg = FSAFCfg(
        num_classes=h.get("num_classes", 80),
        strides=tuple(h["anchor_generator"].get("strides",
                                                (8, 16, 32, 64, 128))),
        pos_scale=assigner.get("pos_scale", 0.2),
        ignore_scale=assigner.get("neg_scale", 0.5),
        tblr_normalizer=h.get("bbox_coder", {}).get("normalizer", 4.0),
        loss_cls_weight=h.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=h.get("loss_bbox", {}).get("loss_weight", 1.0),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=head)
    return FSAFDetector(
        net, cfg, ag,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_paa(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """PAA (reference ``dense_heads/paa_head.py:47``): ATSS architecture +
    GMM anchor reassignment + score voting."""
    from .models.dense_heads.atss_head import ATSSConvs
    from .models.dense_heads.paa_head import PAACfg
    from .models.detectors.single_stage import (
        PAADetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    ag = build_anchor_generator(head["anchor_generator"])
    means, stds = _coder_params(head.get("bbox_coder", {}))
    num_classes = head.get("num_classes", 80)
    loss_cls = head.get("loss_cls", {})
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    module = ATSSConvs(
        num_classes=num_classes,
        num_anchors=len(ag.base_anchors[0]),
        feat_channels=head.get("feat_channels", 256),
        stacked_convs=head.get("stacked_convs", 4),
        num_levels=len(ag.strides),
        dtype=dtype,
    )
    hc = PAACfg(
        num_classes=num_classes,
        topk=train_cfg.get("topk", 9),
        target_means=means,
        target_stds=stds,
        focal_gamma=loss_cls.get("gamma", 2.0),
        focal_alpha=loss_cls.get("alpha", 0.25),
        loss_cls_type=("qfl" if loss_cls.get("type") == "QualityFocalLoss"
                       else "focal"),
        loss_cls_weight=loss_cls.get("loss_weight", 1.0),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 1.3),
        loss_iou_weight=head.get("loss_centerness", {}).get(
            "loss_weight", 0.5
        ),
        score_voting=test_cfg.get("score_voting", True),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=module)
    return PAADetector(
        net, hc, ag,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_yolof(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """YOLOF (reference ``detectors/yolof.py``)."""
    from .models.dense_heads.yolof_head import (
        DilatedEncoder,
        YOLOFCfg,
        YOLOFConvs,
    )
    from .models.detectors.single_stage import (
        SingleStageNet,
        SSTestCfg,
        YOLOFDetector,
    )

    test_cfg = model_cfg.get("test_cfg") or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    nk = model_cfg["neck"]
    neck = DilatedEncoder(
        out_channels=nk.get("out_channels", 512),
        block_mid_channels=nk.get("block_mid_channels", 128),
        num_residual_blocks=nk.get("num_residual_blocks", 4),
        dtype=dtype,
    )
    h = model_cfg["bbox_head"]
    ag = build_anchor_generator(h["anchor_generator"])
    means, stds = _coder_params(h.get("bbox_coder", {}))
    num_classes = h.get("num_classes", 80)
    head = YOLOFConvs(
        num_classes=num_classes,
        num_anchors=len(ag.base_anchors[0]),
        feat_channels=nk.get("out_channels", 512),
        num_cls_convs=h.get("num_cls_convs", 2),
        num_reg_convs=h.get("num_reg_convs", 4),
        dtype=dtype,
    )
    assigner = train_cfg.get("assigner", {})
    cfg = YOLOFCfg(
        num_classes=num_classes,
        target_means=means,
        target_stds=stds,
        match_times=assigner.get("match_times", 4),
        pos_ignore_thr=assigner.get("pos_ignore_thr", 0.15),
        neg_ignore_thr=assigner.get("neg_ignore_thr", 0.7),
        loss_cls_weight=h.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=h.get("loss_bbox", {}).get("loss_weight", 1.0),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=head)
    return YOLOFDetector(
        net, cfg, ag,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_panoptic_fpn(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """PanopticFPN (reference ``detectors/panoptic_fpn.py``): Mask R-CNN +
    the summed conv-upsample semantic head."""
    from .models.detectors.panoptic_fpn import PanopticFPNDetector
    from .models.seg_heads.panoptic_fpn_head import PanopticFPNHead

    cfg2 = copy.deepcopy(model_cfg)
    cfg2["type"] = "MaskRCNN"
    cfg2.pop("semantic_head", None)
    base = build_detector(cfg2, dtype=dtype)
    sh = model_cfg.get("semantic_head", {}) or {}
    num_things = sh.get("num_things_classes", 80)
    num_stuff = sh.get("num_stuff_classes", 53)
    head = PanopticFPNHead(
        num_classes=num_stuff + 1,
        inner_channels=sh.get("inner_channels", 128),
        start_level=sh.get("start_level", 0),
        end_level=sh.get("end_level", 4),
        dtype=dtype,
    )
    det = PanopticFPNDetector.__new__(PanopticFPNDetector)
    det.__dict__.update(base.__dict__)
    det.semantic_head = head
    det.num_things = num_things
    det.num_stuff = num_stuff
    det.seg_loss_weight = sh.get("loss_seg", {}).get("loss_weight", 0.5)
    return det




def build_reppoints(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """RepPoints (reference ``dense_heads/reppoints_head.py:16``)."""
    from .models.dense_heads.reppoints_head import (
        RepPointsCfg,
        RepPointsConvs,
    )
    from .models.detectors.single_stage import (
        RepPointsDetector,
        SingleStageNet,
        SSTestCfg,
    )

    test_cfg = model_cfg.get("test_cfg") or {}
    train_cfg = model_cfg.get("train_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    h = model_cfg["bbox_head"]
    strides = tuple(h.get("point_strides", (8, 16, 32, 64, 128)))
    head = RepPointsConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=h.get("feat_channels", 256),
        point_feat_channels=h.get("point_feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 3),
        num_points=h.get("num_points", 9),
        gradient_mul=h.get("gradient_mul", 0.1),
        num_levels=len(strides),
        use_grid_points=h.get("use_grid_points", False),
        point_base_scale=h.get("point_base_scale", 4),
        dtype=dtype,
    )
    init_assigner = (train_cfg.get("init") or {}).get("assigner", {})
    refine_assigner = (train_cfg.get("refine") or {}).get("assigner", {})
    cfg = RepPointsCfg(
        num_classes=h.get("num_classes", 80),
        num_points=h.get("num_points", 9),
        strides=strides,
        point_base_scale=h.get("point_base_scale", 4),
        assigner_scale=init_assigner.get("scale", 4),
        init_pos_num=init_assigner.get("pos_num", 1),
        refine_pos_iou=refine_assigner.get("pos_iou_thr", 0.5),
        transform_method=h.get("transform_method", "moment"),
        loss_cls_weight=h.get("loss_cls", {}).get("loss_weight", 1.0),
        init_loss_weight=h.get("loss_bbox_init", {}).get("loss_weight", 0.5),
        refine_loss_weight=h.get("loss_bbox_refine", {}).get(
            "loss_weight", 1.0
        ),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=head)
    return RepPointsDetector(
        net, cfg,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_deformable_detr(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """Deformable DETR (reference ``detectors/deformable_detr.py``)."""
    from .models.detectors.deformable_detr import (
        DeformableDETRCfg,
        DeformableDETRDetector,
        DeformableDETRNet,
    )

    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    h = model_cfg["bbox_head"]
    num_classes = h.get("num_classes", 80)
    tr = h.get("transformer", {}) or {}
    net = DeformableDETRNet(
        backbone=backbone,
        neck=neck,
        num_classes=num_classes,
        embed_dims=h.get("embed_dims", 256),
        num_queries=h.get("num_query", 300),
        num_heads=tr.get("num_heads", 8),
        num_points=tr.get("num_points", 4),
        num_encoder_layers=tr.get("num_encoder_layers", 6),
        num_decoder_layers=tr.get("num_decoder_layers", 6),
        ffn_dims=tr.get("feedforward_channels", 1024),
        with_box_refine=h.get("with_box_refine", False),
        as_two_stage=h.get("as_two_stage", False),
        dtype=dtype,
    )
    cfg = DeformableDETRCfg(
        num_classes=num_classes,
        cls_weight=h.get("loss_cls", {}).get("loss_weight", 2.0),
        bbox_weight=h.get("loss_bbox", {}).get("loss_weight", 5.0),
        iou_weight=h.get("loss_iou", {}).get("loss_weight", 2.0),
    )
    test_cfg = model_cfg.get("test_cfg") or {}
    return DeformableDETRDetector(
        net, cfg, max_per_img=test_cfg.get("max_per_img", 100)
    )




def build_nasfcos(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """NAS-FCOS (reference ``detectors/nasfcos.py``): FCOS with the
    searched head tower + NASFCOS_FPN neck."""
    from .models.dense_heads.fcos_head import FCOSCfg
    from .models.dense_heads.nasfcos import NASFCOSConvs
    from .models.detectors.single_stage import (
        FCOSDetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    strides = tuple(head.get("strides", (8, 16, 32, 64, 128)))
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=NASFCOSConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 256),
            num_levels=len(strides),
            dtype=dtype,
        ),
    )
    hc = FCOSCfg(num_classes=num_classes, strides=strides)
    nms = test_cfg.get("nms", {})
    return FCOSDetector(
        net, hc,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            nms_iou_thr=nms.get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_ld(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """LD (reference ``configs/ld``): GFL student + frozen GFL teacher.

    The teacher is built from ``teacher_config`` (a model dict or config
    path); its weights are supplied at train time via
    ``detector.set_teacher_variables`` (offline: no released ckpt)."""
    from .models.detectors.single_stage import LDDetector

    student_cfg = dict(model_cfg)
    student_cfg["type"] = "GFL"
    head = student_cfg.get("bbox_head", {})
    ld_cfg = head.get("loss_ld", {}) or {}
    student = build_gfl(student_cfg, dtype=dtype)
    teacher = None
    tcfg = model_cfg.get("teacher_config")
    if tcfg is not None:
        if isinstance(tcfg, str):
            from .config import load_config

            tcfg = load_config(tcfg).model.to_dict()
        tcfg = dict(tcfg)
        tcfg["type"] = "GFL"
        teacher = build_gfl(tcfg, dtype=dtype)
    return LDDetector(
        student.net, student.anchor_generator, student.head_cfg,
        teacher=teacher,
        ld_weight=ld_cfg.get("loss_weight", 0.25),
        ld_T=ld_cfg.get("T", 10.0),
        test_cfg=student.test_cfg,
    )


def build_centripetalnet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """CentripetalNet (reference ``detectors/cornernet.py`` +
    ``centripetal_head.py``: CornerNet detector with a CentripetalHead)."""
    from .models.dense_heads.centripetal_head import (
        CentripetalCfg,
        CentripetalConvs,
        centripetal_decode_single,
        centripetal_loss_single,
    )
    from .models.backbones.hourglass import HourglassNet
    from .models.detectors.single_stage import (
        CornerNetDetector,
        SingleStageNet,
    )

    head = model_cfg.get("bbox_head", {})
    bb = model_cfg["backbone"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    import flax.linen as nn_

    class _IdNeck(nn_.Module):
        def __call__(self, x):
            return x

    net = SingleStageNet(
        backbone=HourglassNet(
            num_stacks=bb.get("num_stacks", 2),
            depth=bb.get("downsample_times", 5),
            feat_channel=bb.get("feat_channel", 256),
            dtype=dtype,
        ),
        neck=_IdNeck(),
        head=CentripetalConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 256),
            dtype=dtype,
        ),
    )
    cfg = CentripetalCfg(
        num_classes=num_classes,
        corner_topk=test_cfg.get("corner_topk", 100),
        max_per_img=test_cfg.get("max_per_img", 100),
        score_thr=test_cfg.get("score_thr", 0.05),
        guiding_weight=head.get("loss_guiding_shift", {}).get(
            "loss_weight", 0.05),
        centripetal_weight=head.get("loss_centripetal_shift", {}).get(
            "loss_weight", 1.0),
    )
    det = CornerNetDetector(net, cfg)
    det._loss_single = centripetal_loss_single
    det._decode_single = centripetal_decode_single
    return det


def build_cornernet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """CornerNet (reference ``detectors/cornernet.py``)."""
    from .models.backbones.hourglass import HourglassNet
    from .models.dense_heads.corner_head import CornerCfg, CornerHeadConvs
    from .models.detectors.single_stage import (
        CornerNetDetector,
        SingleStageNet,
    )

    bb = model_cfg["backbone"]
    backbone = HourglassNet(
        num_stacks=bb.get("num_stacks", 2),
        depth=bb.get("downsample_times", 5),
        feat_channel=bb.get("feat_channel", 256),
        dtype=dtype,
    )
    h = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    head = CornerHeadConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=bb.get("feat_channel", 256),
        dtype=dtype,
    )
    cfg = CornerCfg(
        num_classes=h.get("num_classes", 80),
        pull_weight=h.get("loss_embedding", {}).get("pull_weight", 0.1)
        if isinstance(h.get("loss_embedding"), dict) else 0.1,
        push_weight=h.get("loss_embedding", {}).get("push_weight", 0.1)
        if isinstance(h.get("loss_embedding"), dict) else 0.1,
        corner_topk=test_cfg.get("corner_topk", 100),
        max_per_img=test_cfg.get("max_per_img", 100),
        score_thr=test_cfg.get("score_thr", 0.05),
        distance_thr=test_cfg.get("distance_threshold", 0.5),
    )

    class _Identity:
        def __call__(self, x):
            return x

    import flax.linen as nn_

    class _IdNeck(nn_.Module):
        def __call__(self, x):
            return x

    net = SingleStageNet(backbone=backbone, neck=_IdNeck(), head=head)
    return CornerNetDetector(net, cfg)




def build_free_anchor(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """FreeAnchor RetinaNet (reference free_anchor_retina_head.py)."""
    from .models.dense_heads.free_anchor_head import FreeAnchorCfg
    from .models.dense_heads.retina_head import RetinaCfg, RetinaConvs
    from .models.detectors.single_stage import (
        FreeAnchorDetector,
        SingleStageNet,
        SSTestCfg,
    )

    h = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    ag = build_anchor_generator(h["anchor_generator"])
    means, stds = _coder_params(h.get("bbox_coder", {}))
    num_classes = h.get("num_classes", 80)
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    module = RetinaConvs(
        num_classes=num_classes,
        num_anchors=len(ag.base_anchors[0]),
        feat_channels=h.get("feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 4),
        dtype=dtype,
    )
    fa = FreeAnchorCfg(
        num_classes=num_classes,
        target_means=means,
        target_stds=stds,
        pre_anchor_topk=h.get("pre_anchor_topk", 50),
        bbox_thr=h.get("bbox_thr", 0.6),
        gamma=h.get("gamma", 2.0),
        alpha=h.get("alpha", 0.5),
        smooth_l1_beta=h.get("loss_bbox", {}).get("beta", 0.11),
        loss_bbox_weight=h.get("loss_bbox", {}).get("loss_weight", 0.75),
    )
    rc = RetinaCfg(
        num_classes=num_classes, target_means=means, target_stds=stds
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=module)
    return FreeAnchorDetector(
        net, fa, rc, ag,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )




def build_autoassign(model_cfg: Dict[str, Any], dtype=jnp.float32):
    """AutoAssign (reference ``detectors/autoassign.py``)."""
    from .models.dense_heads.autoassign_head import AutoAssignCfg
    from .models.dense_heads.fcos_head import FCOSConvs
    from .models.detectors.single_stage import (
        AutoAssignDetector,
        SingleStageNet,
        SSTestCfg,
    )

    h = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    neck = build_neck(model_cfg["neck"], dtype=dtype)
    strides = tuple(h.get("strides", (8, 16, 32, 64, 128)))
    head = FCOSConvs(
        num_classes=h.get("num_classes", 80),
        feat_channels=h.get("feat_channels", 256),
        stacked_convs=h.get("stacked_convs", 4),
        num_levels=len(strides),
        dtype=dtype,
    )
    cfg = AutoAssignCfg(
        num_classes=h.get("num_classes", 80),
        strides=strides,
        pos_loss_weight=h.get("pos_loss_weight", 0.25),
        neg_loss_weight=h.get("neg_loss_weight", 0.75),
        center_loss_weight=h.get("center_loss_weight", 0.75),
        reg_loss_weight=h.get("loss_bbox", {}).get("loss_weight", 5.0),
    )
    net = SingleStageNet(backbone=backbone, neck=neck, head=head)
    return AutoAssignDetector(
        net, cfg,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_detector(
    model_cfg: Dict[str, Any],
    dtype=jnp.float32,
):
    """Build a detector from a full (merged) model config dict."""
    model_cfg = copy.deepcopy(model_cfg)
    t = model_cfg["type"]
    if t == "FCOS":
        return build_fcos(model_cfg, dtype=dtype)
    if t == "NASFCOS" or model_cfg.get("bbox_head", {}).get(
            "type") == "NASFCOSHead":
        return build_nasfcos(model_cfg, dtype=dtype)
    if t == "LD" or t == "KnowledgeDistillationSingleStageDetector":
        return build_ld(model_cfg, dtype=dtype)
    if t == "GFL":
        return build_gfl(model_cfg, dtype=dtype)
    if t == "SingleStageSSD" or t == "SSD":
        return build_ssd(model_cfg, dtype=dtype)
    if t == "YOLOV3":
        return build_yolo(model_cfg, dtype=dtype)
    if t == "DETR":
        return build_detr(model_cfg, dtype=dtype)
    if t == "DeformableDETR":
        return build_deformable_detr(model_cfg, dtype=dtype)
    if t == "CornerNet":
        return build_cornernet(model_cfg, dtype=dtype)
    if t == "CentripetalNet" or model_cfg.get("bbox_head", {}).get(
            "type") == "CentripetalHead":
        return build_centripetalnet(model_cfg, dtype=dtype)
    if t == "FreeAnchor":
        return build_free_anchor(model_cfg, dtype=dtype)
    if t == "AutoAssign":
        return build_autoassign(model_cfg, dtype=dtype)
    if t == "CenterNet":
        return build_centernet(model_cfg, dtype=dtype)
    if t == "SparseRCNN":
        return build_sparse_rcnn(model_cfg, dtype=dtype)
    if t == "YOLOX":
        return build_yolox(model_cfg, dtype=dtype)
    if t == "FOVEA" or t == "FoveaBox":
        return build_fovea(model_cfg, dtype=dtype)
    if t == "RPN":
        return build_rpn_detector(model_cfg, dtype=dtype)
    if model_cfg.get("bbox_head", {}).get("type") == "GARetinaHead":
        return build_ga_retinanet(model_cfg, dtype=dtype)
    if t in ("RetinaNet", "ATSS", "SingleStageDetector"):
        return build_single_stage(model_cfg, dtype=dtype)
    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    if t == "CascadeRCNN":
        if (model_cfg.get("roi_head") or {}).get("mask_head"):
            # Cascade Mask R-CNN: per-stage mask heads on the stage's own
            # sampled rois — the HTC machinery with interleaved execution
            # and mask info flow switched off (reference
            # ``cascade_roi_head.py`` vs ``htc_roi_head.py``)
            return build_htc(model_cfg, dtype=dtype)
        return build_cascade(model_cfg, dtype=dtype)
    if t == "SABLRetinaNet" or model_cfg.get("bbox_head", {}).get(
            "type") == "SABLRetinaHead":
        return build_sabl_retinanet(model_cfg, dtype=dtype)
    if t == "YOLACT":
        return build_yolact(model_cfg, dtype=dtype)
    if t == "TridentFasterRCNN":
        return build_trident(model_cfg, dtype=dtype)
    if t == "SCNet":
        return build_scnet(model_cfg, dtype=dtype)
    if t in ("HybridTaskCascade", "HTC"):
        return build_htc(model_cfg, dtype=dtype)
    if t == "SOLO":
        return build_solo(model_cfg, dtype=dtype)
    if t == "VFNet":
        return build_vfnet(model_cfg, dtype=dtype)
    if t == "FSAF":
        return build_fsaf(model_cfg, dtype=dtype)
    if t == "PAA":
        return build_paa(model_cfg, dtype=dtype)
    if t == "YOLOF":
        return build_yolof(model_cfg, dtype=dtype)
    if t == "PanopticFPN":
        return build_panoptic_fpn(model_cfg, dtype=dtype)
    if t == "RepPointsDetector" or t == "RepPoints":
        return build_reppoints(model_cfg, dtype=dtype)
    if t in ("FasterRCNN", "MaskRCNN", "MaskScoringRCNN", "ProbTwoStage",
             "TwoStageDetector", "PointRend", "GridRCNN", "FastRCNN",
             "EMAFasterRCNN", "DGFasterRCNN", "JiGENFasterRCNN",
             "DGaugFasterRCNN"):
        backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
        if model_cfg.get("neck"):
            neck = build_neck(model_cfg["neck"], dtype=dtype)
        else:
            # neck-less C4/DC5 variants (reference
            # faster_rcnn_r50_caffe_c4/dc5): the single backbone map feeds
            # RPN and RoI directly
            from flax import linen as _nn

            class _IdentityNeck(_nn.Module):
                def __call__(self, x):
                    return x

            neck = _IdentityNeck()
        rpn_head_cfg = model_cfg.get("rpn_head")
        if rpn_head_cfg is None:  # FastRCNN: external proposals, no RPN
            rpn_head_cfg = {
                "type": "RPNHead",
                "anchor_generator": {
                    "type": "AnchorGenerator", "scales": [8],
                    "ratios": [0.5, 1.0, 2.0],
                    "strides": [4, 8, 16, 32, 64],
                },
                "bbox_coder": {"type": "DeltaXYWHBBoxCoder"},
            }
        rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
            rpn_head_cfg, train_cfg.get("rpn", {}), dtype=dtype
        )
        roi = model_cfg["roi_head"]
        if roi.get("shared_head"):
            # C4: shared res5 head + avg-pool bbox head (reference
            # ``roi_heads/shared_heads/res_layer.py``)
            from .models.detectors.trident import Res5BBoxHead

            bhc = roi["bbox_head"]
            means, stds = _coder_params(bhc.get("bbox_coder", {}))
            bbox_module = Res5BBoxHead(
                num_classes=bhc.get("num_classes", 80),
                reg_class_agnostic=bhc.get("reg_class_agnostic", False),
                style=roi["shared_head"].get("style", "pytorch"),
                dtype=dtype,
            )
            bbox_cfg = BBoxHeadCfg(
                num_classes=bhc.get("num_classes", 80),
                target_means=means,
                target_stds=stds,
                reg_class_agnostic=bhc.get("reg_class_agnostic", False),
                loss_bbox_weight=bhc.get("loss_bbox", {}).get(
                    "loss_weight", 1.0),
                smooth_l1_beta=bhc.get("loss_bbox", {}).get("beta", 1.0),
            )
        else:
            bbox_module, bbox_cfg = build_bbox_head(
                roi["bbox_head"], dtype=dtype)
        if roi.get("type") == "DynamicRoIHead":
            # Dynamic R-CNN (reference configs/dynamic_rcnn): working
            # iou_thr/beta live in the head's batch_stats
            _dr = (train_cfg.get("rcnn", {}) or {}).get("dynamic_rcnn", {})
            bbox_module = bbox_module.clone(
                dynamic=True,
                dyn_initial_iou=_dr.get("initial_iou", 0.4),
                dyn_initial_beta=_dr.get("initial_beta", 1.0),
                dyn_interval=_dr.get("update_iter_interval", 100),
            )
        mask_module = None
        mask_iou_module = None
        point_module = None
        grid_module = None
        if t == "GridRCNN":
            from .models.roi_heads.grid_head import GridHead

            gh = roi.get("grid_head") or {}
            grid_module = GridHead(
                grid_points=gh.get("grid_points", 9),
                num_convs=gh.get("num_convs", 8),
                roi_feat_size=gh.get("roi_feat_size", 14),
                point_feat_channels=gh.get("point_feat_channels", 64),
                dtype=dtype,
            )
        if t == "PointRend":
            from .models.roi_heads.point_rend import (
                CoarseMaskHead,
                MaskPointHead,
            )

            mh = roi.get("mask_head") or {}
            ph = roi.get("point_head") or {}
            mask_module = CoarseMaskHead(
                num_classes=mh.get("num_classes", bbox_cfg.num_classes),
                num_convs=mh.get("num_convs", 0),
                num_fcs=mh.get("num_fcs", 2),
                fc_channels=mh.get("fc_out_channels", 1024),
                roi_feat_size=mh.get("roi_feat_size", 14),
                downsample_factor=mh.get("downsample_factor", 2),
                dtype=dtype,
            )
            point_module = MaskPointHead(
                num_classes=ph.get("num_classes", bbox_cfg.num_classes),
                num_fcs=ph.get("num_fcs", 3),
                fc_channels=ph.get("fc_channels", 256),
                coarse_pred_each_layer=ph.get("coarse_pred_each_layer", True),
                dtype=dtype,
            )
        elif roi.get("mask_head"):
            from .models.roi_heads.mask_head import FCNMaskHead

            mh = roi["mask_head"]
            mask_module = FCNMaskHead(
                num_classes=mh.get("num_classes", bbox_cfg.num_classes),
                num_convs=mh.get("num_convs", 4),
                conv_channels=mh.get("conv_out_channels", 256),
                norm_cfg=mh.get("norm_cfg"),
                predictor_cfg=mh.get("predictor_cfg"),
                dtype=dtype,
            )
            if roi.get("mask_iou_head") or t == "MaskScoringRCNN":
                from .models.roi_heads.mask_head import MaskIoUHead

                mih = roi.get("mask_iou_head") or {}
                mask_iou_module = MaskIoUHead(
                    num_classes=mih.get("num_classes",
                                        mh.get("num_classes",
                                               bbox_cfg.num_classes)),
                    num_convs=mih.get("num_convs", 4),
                    conv_channels=mih.get("conv_out_channels", 256),
                    fc_channels=mih.get("fc_out_channels", 1024),
                    dtype=dtype,
                )
        extractor = roi.get("bbox_roi_extractor", {})
        strides = tuple(extractor.get("featmap_strides", (8, 16, 32, 64, 128)))
        roi_layer = extractor.get("roi_layer", {})
        deform_pool_module = None
        if roi_layer.get("type") in ("DeformRoIPoolPack",
                                     "ModulatedDeformRoIPoolPack"):
            from .models.roi_heads.deform_roi_pool_pack import (
                DeformRoIPoolPack,
            )

            deform_pool_module = DeformRoIPoolPack(
                out_size=roi_layer.get("output_size", 7),
                strides=strides,
                deform_fc_channels=roi_layer.get("deform_fc_channels", 1024),
                gamma=roi_layer.get("gamma", 0.1),
                modulated=roi_layer.get("type")
                == "ModulatedDeformRoIPoolPack",
                finest_scale=extractor.get("finest_scale", 56),
                dtype=dtype,
            )
        mask_extractor = roi.get("mask_roi_extractor") or {}
        # C4 Mask R-CNN: mask_roi_extractor=None + shared_head -> the mask
        # branch shares the bbox extraction and the res5 stage (reference
        # configs/_base_/models/mask_rcnn_r50_caffe_c4.py)
        mask_on_shared = bool(
            roi.get("shared_head")
            and mask_module is not None
            and not roi.get("mask_roi_extractor")
        )
        domain_module = None
        jig_module = None
        if t == "DGFasterRCNN":
            # reference detectors/faster_rcnn.py:84 (DANN thesis variant):
            # domain_cls(512, num_domains=2) + total_img = 112128/2
            from .models.detectors.dg import DomainClassifier

            domain_module = DomainClassifier(
                num_domains=model_cfg.get("num_domains", 2),
                total_img=float(model_cfg.get("total_img", 56064)),
                dtype=dtype,
            )
        if t == "JiGENFasterRCNN":
            # reference detectors/faster_rcnn.py:427: jig_cls(2048, 31)
            from .models.detectors.dg import JigsawClassifier

            jig_module = JigsawClassifier(
                jig_classes=model_cfg.get("jig_classes", 31), dtype=dtype)
        emau_module = None
        if t == "EMAFasterRCNN":
            # reference detectors/faster_rcnn.py:730 (thesis EMAU variant):
            # one FP_EMAU over the neck outputs, k from the config
            from .models.thesis_extras import FPEMAU

            emau_module = FPEMAU(k=model_cfg.get("k", 64), dtype=dtype)
        net = TwoStageNet(
            backbone=backbone,
            neck=neck,
            emau=emau_module,
            domain_head=domain_module,
            jig_head=jig_module,
            rpn=rpn_module,
            bbox_head=bbox_module,
            mask_head=mask_module,
            mask_iou_head=mask_iou_module,
            point_head=point_module,
            grid_head=grid_module,
            roi_deform_pool=deform_pool_module,
            bridge=(t == "ProbTwoStage")
            or (model_cfg.get("rpn_head") or {}).get("bridge", False),
            roi_strides=strides,
            roi_out_size=roi_layer.get("output_size", 7),
            mask_roi_out_size=(
                roi_layer.get("output_size", 14) if mask_on_shared
                else mask_extractor.get("roi_layer", {}).get(
                    "output_size", 14)
            ),
            mask_on_shared=mask_on_shared,
            roi_finest_scale=extractor.get("finest_scale", 56),
            roi_aggregation=(
                extractor.get("aggregation", "sum")
                if extractor.get("type") == "GenericRoIExtractor"
                else "route"
            ),
        )
        rcnn_train = train_cfg.get("rcnn", {})
        sampler = rcnn_train.get("sampler", {})
        assigner = rcnn_train.get("assigner", {})
        roi_cfg = ProbRoICfg(
            alpha=roi.get("alpha", 0.0),
            gamma=roi.get("gamma", 0.1),
            boost=roi.get("boost", roi.get("type") == "ProbRoIHead"),
            # ProbPISARoIHead (reference pisa_roi_head.py:163, the fork's
            # PISA+prob combination): PISA ISR-P/CARL training + prob
            # prior-fusion at test, but no boosting loss renormalisation
            prob=roi.get("prob", roi.get("type") in (
                "ProbRoIHead", "BoostRoIHead", "ProbPISARoIHead")),
            quality=roi.get("quality", False),
            iou_gamma=roi.get("iou_gamma", 0.0),
            reg_norm=roi.get("reg_norm", "bbox_num"),
            num_samples=sampler.get("num", 512),
            pos_fraction=sampler.get("pos_fraction", 0.25),
            neg_pos_ub=sampler.get("neg_pos_ub", -1),
            add_gt_as_proposals=sampler.get("add_gt_as_proposals", True),
            pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
            neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
            min_pos_iou=assigner.get("min_pos_iou", 0.5),
            match_low_quality=assigner.get("match_low_quality", False),
            isr=rcnn_train.get("isr"),
            carl=rcnn_train.get("carl"),
        )
        rpn_prop = train_cfg.get("rpn_proposal", {})
        rpn_test = test_cfg.get("rpn", {})
        rcnn_test = test_cfg.get("rcnn", {})
        det_cls = TwoStageDetector
        det_kwargs = {}
        if t in ("DGFasterRCNN", "JiGENFasterRCNN", "DGaugFasterRCNN"):
            from .models.detectors import dg as _dg

            det_cls = {
                "DGFasterRCNN": _dg.DGFasterRCNNDetector,
                "JiGENFasterRCNN": _dg.JiGENFasterRCNNDetector,
                "DGaugFasterRCNN": _dg.DGaugFasterRCNNDetector,
            }[t]
        if roi["bbox_head"].get("type") == "SABLHead":
            from .models.roi_heads.sabl_head import make_sabl_detector_class

            coder = roi["bbox_head"].get("bbox_coder", {})
            det_cls = make_sabl_detector_class()
            det_kwargs.update(
                num_buckets=coder.get("num_buckets", 14),
                bucket_scale_factor=coder.get("scale_factor", 1.7),
            )
        if t == "FastRCNN":
            from .models.detectors.two_stage import FastRCNNDetector

            det_cls = FastRCNNDetector
        if roi.get("type") == "DynamicRoIHead":
            from .models.detectors.two_stage import DynamicRCNNDetector

            _dr = rcnn_train.get("dynamic_rcnn", {})
            det_cls = DynamicRCNNDetector
            det_kwargs.update(
                dyn_iou_topk=_dr.get("iou_topk", 75),
                dyn_beta_topk=_dr.get("beta_topk", 10),
            )
        if t == "GridRCNN":
            from .models.detectors.grid_rcnn import GridRCNN as _GridRCNN
            from .models.roi_heads.grid_head import GridCfg

            gtr = train_cfg.get("rcnn", {}) or {}
            det_cls = _GridRCNN
            det_kwargs["grid_cfg"] = GridCfg(
                grid_points=(roi.get("grid_head") or {}).get(
                    "grid_points", 9),
                pos_radius=gtr.get("pos_radius", 1),
            )
        if t == "PointRend":
            from .models.detectors.point_rend_det import PointRendDetector
            from .models.roi_heads.point_rend import PointRendCfg

            pc = train_cfg.get("rcnn", {}).get("point", {}) or {}
            tc_pt = test_cfg.get("rcnn", {}) or {}
            det_cls = PointRendDetector
            det_kwargs["point_cfg"] = PointRendCfg(
                num_points=pc.get("num_points", 196),
                oversample_ratio=pc.get("oversample_ratio", 3.0),
                importance_sample_ratio=pc.get(
                    "importance_sample_ratio", 0.75
                ),
                subdivision_steps=tc_pt.get("subdivision_steps", 5),
                subdivision_num_points=tc_pt.get(
                    "subdivision_num_points", 784
                ),
                scale_factor=tc_pt.get("scale_factor", 2),
            )
        return det_cls(
            net,
            ag,
            **det_kwargs,
            rpn_cfg=rpn_cfg,
            roi_cfg=roi_cfg,
            bbox_cfg=bbox_cfg,
            train_proposal_cfg=ProposalCfg(
                nms_pre=rpn_prop.get("nms_pre", 4000),
                approx_topk=rpn_prop.get("approx_topk", False),
            topk_recall_target=rpn_prop.get("topk_recall_target", 0.95),
                max_per_img=rpn_prop.get("max_per_img", 2000),
                nms_iou_thr=rpn_prop.get("nms", {}).get("iou_threshold", 0.7),
                min_bbox_size=rpn_prop.get("min_bbox_size", 0),
            ),
            test_proposal_cfg=ProposalCfg(
                nms_pre=rpn_test.get("nms_pre", 1000),
                approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
                max_per_img=rpn_test.get("max_per_img", 256),
                nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
                min_bbox_size=rpn_test.get("min_bbox_size", 0),
            ),
            rcnn_test_cfg=RCNNTestCfg(
                score_thr=rcnn_test.get("score_thr", 0.05),
                nms_iou_thr=rcnn_test.get("nms", {}).get("iou_threshold", 0.5),
                nms_type=rcnn_test.get("nms", {}).get("type", "nms"),
                max_per_img=rcnn_test.get("max_per_img", 100),
                pre_nms_top_k=rcnn_test.get("pre_nms_top_k", 2048),
            ),
            rpn_type=rpn_type,
        )
    raise KeyError(f"unknown detector type {t}")


def build_fcos(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.dense_heads.fcos_head import FCOSCfg, FCOSConvs
    from .models.detectors.single_stage import (
        FCOSDetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    strides = tuple(head.get("strides", (8, 16, 32, 64, 128)))
    loss_cls = head.get("loss_cls", {})
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=FCOSConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            num_levels=len(strides),
            centerness_on_reg=head.get("centerness_on_reg", False),
            norm_on_bbox=head.get("norm_on_bbox", False),
            strides=strides,
            dtype=dtype,
        ),
    )
    hc = FCOSCfg(
        num_classes=num_classes,
        strides=strides,
        center_sampling=head.get("center_sampling", False),
        center_sample_radius=head.get("center_sample_radius", 1.5),
        focal_gamma=loss_cls.get("gamma", 2.0),
        focal_alpha=loss_cls.get("alpha", 0.25),
        loss_cls_weight=loss_cls.get("loss_weight", 1.0),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 1.0),
        loss_bbox_type=("giou" if head.get("loss_bbox", {}).get(
            "type") == "GIoULoss" else "iou"),
    )
    return FCOSDetector(
        net, hc,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_gfl(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.dense_heads.gfl_head import GFLCfg, GFLConvs
    from .models.detectors.single_stage import (
        GFLDetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    ag = build_anchor_generator(head["anchor_generator"])
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=GFLConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            num_levels=len(ag.strides),
            reg_max=head.get("reg_max", 16),
            dtype=dtype,
        ),
    )
    hc = GFLCfg(
        num_classes=num_classes,
        strides=tuple(s[0] for s in ag.strides),
        reg_max=head.get("reg_max", 16),
        loss_cls_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 2.0),
        loss_dfl_weight=head.get("loss_dfl", {}).get("loss_weight", 0.25),
    )
    return GFLDetector(
        net, ag, hc,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.6),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_ssd(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.vgg import SSDVGG
    from .models.dense_heads.ssd_head import (
        SSDCfg,
        SSDConvs,
        ssd_anchor_generator,
    )
    from .models.detectors.single_stage import (
        SingleStageNet,
        SSDDetector,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    agc = head.get("anchor_generator", {})
    input_size = agc.get("input_size", 300)
    gens = ssd_anchor_generator(
        input_size=input_size,
        strides=tuple(agc.get("strides", (8, 16, 32, 64, 100, 300))),
        ratios=tuple(tuple(r) for r in agc.get("ratios",
                     ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,)))),
        basesize_ratio_range=tuple(agc.get("basesize_ratio_range", (0.15, 0.9))),
        min_sizes=agc.get("min_sizes"),
        max_sizes=agc.get("max_sizes"),
    )
    num_anchors = tuple(len(g.base_anchors[0]) for g in gens)

    class _Identity:
        def __call__(self, x):
            return x

    import flax.linen as fnn

    class IdentityNeck(fnn.Module):
        def __call__(self, x):
            return x

    # SSDNeck-style extras spec (reference ssd512 config neck=dict(...)):
    # out_channels after conv4_3/fc7 define the extra pyramid; mid = out//2
    neck_cfg = model_cfg.get("neck") or {}
    if model_cfg.get("backbone", {}).get("type") == "MobileNetV2":
        # SSDLite (reference ssdlite_mobilenetv2_scratch_600e_coco):
        # MobileNetV2 (4, 7) features + depthwise SSDNeck extras +
        # depthwise prediction convs
        from .models.dense_heads.ssd_head import SSDNeck

        backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
        net = SingleStageNet(
            backbone=backbone,
            neck=SSDNeck(
                out_channels=tuple(neck_cfg.get(
                    "out_channels", (96, 1280, 512, 256, 256, 128))),
                num_backbone_levels=len(tuple(model_cfg["backbone"].get(
                    "out_indices", (4, 7)))),
                dtype=dtype,
            ),
            head=SSDConvs(
                num_classes=num_classes, num_anchors=num_anchors,
                use_depthwise=head.get("use_depthwise", True), dtype=dtype,
            ),
        )
    else:
        vgg_kwargs = {}
        if neck_cfg.get("out_channels"):
            outs = tuple(neck_cfg["out_channels"])[2:]
            lvl_strides = tuple(neck_cfg.get("level_strides",
                                             (2,) * (len(outs) - 2) + (1, 1)))
            vgg_kwargs = dict(
                extra_channels=tuple(
                    (o // 2, o, s) for o, s in zip(outs, lvl_strides)),
                last_kernel_size=neck_cfg.get("last_kernel_size", 3),
            )
        net = SingleStageNet(
            backbone=SSDVGG(dtype=dtype, **vgg_kwargs),
            neck=IdentityNeck(),
            head=SSDConvs(num_classes=num_classes, num_anchors=num_anchors,
                          dtype=dtype),
        )
    coder = head.get("bbox_coder", {})
    assigner = (model_cfg.get("train_cfg") or {}).get("assigner", {})
    hc = SSDCfg(
        num_classes=num_classes,
        target_means=tuple(coder.get("target_means", (0.0,) * 4)),
        target_stds=tuple(coder.get("target_stds", (0.1, 0.1, 0.2, 0.2))),
        pos_iou_thr=assigner.get("pos_iou_thr", 0.5),
        neg_iou_thr=assigner.get("neg_iou_thr", 0.5),
        min_pos_iou=assigner.get("min_pos_iou", 0.0),
        neg_pos_ratio=(model_cfg.get("train_cfg") or {}).get("neg_pos_ratio", 3),
        pisa=(head.get("type") == "PISASSDHead"
              or (model_cfg.get("train_cfg") or {}).get("isr") is not None),
        isr_k=((model_cfg.get("train_cfg") or {}).get("isr") or {}).get(
            "k", 2.0),
        isr_bias=((model_cfg.get("train_cfg") or {}).get("isr") or {}).get(
            "bias", 0.0),
        carl_k=((model_cfg.get("train_cfg") or {}).get("carl") or {}).get(
            "k", 1.0),
        carl_bias=((model_cfg.get("train_cfg") or {}).get("carl")
                   or {}).get("bias", 0.2),
    )
    return SSDDetector(
        net, gens, hc, input_size=input_size,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.02),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.45),
            max_per_img=test_cfg.get("max_per_img", 200),
        ),
    )


def build_yolo(model_cfg: Dict[str, Any], dtype=jnp.float32):
    import flax.linen as fnn

    from .models.backbones.darknet import Darknet
    from .models.dense_heads.yolo_head import (
        YOLOCfg,
        YOLOV3HeadConvs,
        YOLOV3Neck,
    )
    from .models.detectors.single_stage import (
        SingleStageNet,
        SSTestCfg,
        YOLOV3Detector,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)

    class YOLONet(fnn.Module):
        backbone: fnn.Module
        neck: fnn.Module
        head: fnn.Module

        def __call__(self, images):
            return self.head(self.neck(self.backbone(images)))

    net = YOLONet(
        backbone=Darknet(dtype=dtype),
        neck=YOLOV3Neck(dtype=dtype),
        head=YOLOV3HeadConvs(num_classes=num_classes, dtype=dtype),
    )
    hc = YOLOCfg(num_classes=num_classes)
    return YOLOV3Detector(
        net, hc,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.45),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_detr(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.detectors.detr import DETRCfg, DETRDetector, DETRNet

    head = model_cfg.get("bbox_head", {})
    num_classes = head.get("num_classes", 80)
    net = DETRNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        num_classes=num_classes,
        num_queries=head.get("num_query", 100),
        dim=head.get("embed_dims", 256),
        enc_layers=head.get("enc_layers", 6),
        dec_layers=head.get("dec_layers", 6),
        dtype=dtype,
    )
    cfg = DETRCfg(
        num_classes=num_classes,
        num_queries=head.get("num_query", 100),
        cls_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 5.0),
        iou_weight=head.get("loss_iou", {}).get("loss_weight", 2.0),
    )
    return DETRDetector(
        net, cfg,
        max_per_img=(model_cfg.get("test_cfg") or {}).get("max_per_img", 100),
    )


def build_centernet(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.dense_heads.centernet_head import (
        CenterNetCfg,
        CenterNetConvs,
        CTResNetNeck,
    )
    from .models.detectors.single_stage import (
        CenterNetDetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg.get("bbox_head", {})
    neck_cfg = model_cfg.get("neck", {})
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    channels = tuple(neck_cfg.get("num_deconv_filters", (256, 128, 64)))
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=CTResNetNeck(channels=channels, dtype=dtype),
        head=CenterNetConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channel", channels[-1]),
            dtype=dtype,
        ),
    )
    hc = CenterNetCfg(
        num_classes=num_classes,
        loss_heatmap_weight=head.get("loss_center_heatmap", {}).get("loss_weight", 1.0),
        loss_wh_weight=head.get("loss_wh", {}).get("loss_weight", 0.1),
        loss_offset_weight=head.get("loss_offset", {}).get("loss_weight", 1.0),
    )
    return CenterNetDetector(
        net, hc,
        test_cfg=SSTestCfg(max_per_img=test_cfg.get("topk", 100)),
    )


def build_sparse_rcnn(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.detectors.sparse_rcnn import (
        SparseRCNNCfg,
        SparseRCNNDetector,
        SparseRCNNNet,
    )

    roi = model_cfg.get("roi_head", {})
    rpn = model_cfg.get("rpn_head", {})
    heads = roi.get("bbox_head", [{}])
    head0 = heads[0] if isinstance(heads, list) else heads
    num_classes = head0.get("num_classes", 80)
    num_stages = roi.get("num_stages", 6)
    num_proposals = rpn.get("num_proposals", 100)
    extractor = roi.get("bbox_roi_extractor", {})
    net = SparseRCNNNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        num_classes=num_classes,
        num_proposals=num_proposals,
        num_stages=num_stages,
        dim=roi.get("proposal_feature_channel", 256),
        roi_strides=tuple(extractor.get("featmap_strides", (4, 8, 16, 32))),
        target_stds=tuple(head0.get("bbox_coder", {}).get(
            "target_stds", (0.5, 0.5, 1.0, 1.0))),
        dtype=dtype,
    )
    loss_cls = head0.get("loss_cls", {})
    cfg = SparseRCNNCfg(
        num_classes=num_classes,
        num_proposals=num_proposals,
        num_stages=num_stages,
        cls_weight=loss_cls.get("loss_weight", 2.0),
        bbox_weight=head0.get("loss_bbox", {}).get("loss_weight", 5.0),
        iou_weight=head0.get("loss_iou", {}).get("loss_weight", 2.0),
        focal_alpha=loss_cls.get("alpha", 0.25),
        focal_gamma=loss_cls.get("gamma", 2.0),
    )
    test_cfg = model_cfg.get("test_cfg") or {}
    rcnn_test = test_cfg.get("rcnn") or {}
    return SparseRCNNDetector(
        net, cfg, max_per_img=rcnn_test.get("max_per_img", num_proposals)
    )


@BACKBONES.register("CSPDarknet")
def build_csp_darknet(cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.csp_darknet import CSPDarknet

    return CSPDarknet(
        deepen_factor=cfg.get("deepen_factor", 0.33),
        widen_factor=cfg.get("widen_factor", 0.5),
        out_indices=tuple(cfg.get("out_indices", (2, 3, 4))),
        dtype=dtype,
    )


def build_yolox(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.backbones.csp_darknet import YOLOXPAFPN
    from .models.dense_heads.yolox_head import YOLOXCfg, YOLOXHeadConvs
    from .models.detectors.single_stage import (
        SingleStageNet,
        SSTestCfg,
        YOLOXDetector,
    )

    head = model_cfg["bbox_head"]
    neck = model_cfg.get("neck", {})
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    strides = tuple(head.get("strides", (8, 16, 32)))
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=YOLOXPAFPN(
            out_channels=neck.get("out_channels", 128),
            num_csp_blocks=neck.get("num_csp_blocks", 1),
            dtype=dtype,
        ),
        head=YOLOXHeadConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 128),
            stacked_convs=head.get("stacked_convs", 2),
            num_levels=len(strides),
            dtype=dtype,
        ),
    )
    assigner = (model_cfg.get("train_cfg") or {}).get("assigner", {})
    hc = YOLOXCfg(
        num_classes=num_classes,
        strides=strides,
        center_radius=assigner.get("center_radius", 2.5),
        loss_cls_weight=head.get("loss_cls", {}).get("loss_weight", 1.0),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 5.0),
        loss_obj_weight=head.get("loss_obj", {}).get("loss_weight", 1.0),
    )
    return YOLOXDetector(
        net, hc,
        test_cfg=SSTestCfg(
            score_thr=test_cfg.get("score_thr", 0.01),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.65),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_fovea(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.dense_heads.fovea_head import FoveaCfg
    from .models.dense_heads.retina_head import RetinaConvs
    from .models.detectors.single_stage import (
        FoveaDetector,
        SingleStageNet,
        SSTestCfg,
    )

    head = model_cfg["bbox_head"]
    test_cfg = model_cfg.get("test_cfg") or {}
    num_classes = head.get("num_classes", 80)
    strides = tuple(head.get("strides", (8, 16, 32, 64, 128)))
    loss_cls = head.get("loss_cls", {})
    if head.get("with_deform"):
        from .models.dense_heads.fovea_head import FoveaAlignConvs

        head_module = FoveaAlignConvs(
            num_classes=num_classes,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            deform_groups=head.get("deform_groups", 4),
            norm_cfg=head.get("norm_cfg"),
            dtype=dtype,
        )
    else:
        head_module = RetinaConvs(
            num_classes=num_classes,
            num_anchors=1,
            feat_channels=head.get("feat_channels", 256),
            stacked_convs=head.get("stacked_convs", 4),
            dtype=dtype,
        )
    net = SingleStageNet(
        backbone=build_backbone(model_cfg["backbone"], dtype=dtype),
        neck=build_neck(model_cfg["neck"], dtype=dtype),
        head=head_module,
    )
    hc = FoveaCfg(
        num_classes=num_classes,
        strides=strides,
        base_edge_list=tuple(head.get("base_edge_list", (16, 32, 64, 128, 256))),
        scale_ranges=tuple(tuple(r) for r in head.get(
            "scale_ranges",
            ((1, 64), (32, 128), (64, 256), (128, 512), (256, 2048)))),
        sigma=head.get("sigma", 0.4),
        focal_gamma=loss_cls.get("gamma", 1.5),
        focal_alpha=loss_cls.get("alpha", 0.4),
        loss_cls_weight=loss_cls.get("loss_weight", 1.0),
        loss_bbox_weight=head.get("loss_bbox", {}).get("loss_weight", 1.0),
        smooth_l1_beta=head.get("loss_bbox", {}).get("beta", 0.11),
    )
    return FoveaDetector(
        net, hc,
        test_cfg=SSTestCfg(
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            pre_nms_top_k=test_cfg.get("pre_nms_top_k", 2048),
            nms_iou_thr=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
        ),
    )


def build_rpn_detector(model_cfg: Dict[str, Any], dtype=jnp.float32):
    from .models.detectors.two_stage import RPNDetector, TwoStageNet

    train_cfg = model_cfg.get("train_cfg") or {}
    test_cfg = model_cfg.get("test_cfg") or {}
    backbone = build_backbone(model_cfg["backbone"], dtype=dtype)
    if model_cfg.get("neck"):
        neck = build_neck(model_cfg["neck"], dtype=dtype)
    else:
        # RPN over a neck-less single-level backbone (rpn_r50_caffe_c4)
        from flax import linen as _nn

        class _IdentityNeck(_nn.Module):
            def __call__(self, x):
                return x

        neck = _IdentityNeck()
    rpn_module, rpn_cfg, rpn_type, ag = build_rpn(
        model_cfg["rpn_head"], train_cfg.get("rpn", {}), dtype=dtype
    )
    net = TwoStageNet(
        backbone=backbone, neck=neck, rpn=rpn_module, bbox_head=None,
    )
    rpn_test = test_cfg.get("rpn", test_cfg)
    return RPNDetector(
        net, ag,
        rpn_cfg=rpn_cfg,
        roi_cfg=ProbRoICfg(),
        bbox_cfg=BBoxHeadCfg(num_classes=1),
        train_proposal_cfg=ProposalCfg(),
        test_proposal_cfg=ProposalCfg(
            nms_pre=rpn_test.get("nms_pre", 1000),
            approx_topk=rpn_test.get("approx_topk", False),
            topk_recall_target=rpn_test.get("topk_recall_target", 0.95),
            max_per_img=rpn_test.get("max_per_img", 1000),
            nms_iou_thr=rpn_test.get("nms", {}).get("iou_threshold", 0.7),
            min_bbox_size=rpn_test.get("min_bbox_size", 0),
        ),
        rpn_type=rpn_type,
    )
