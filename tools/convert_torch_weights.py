#!/usr/bin/env python
"""PyTorch -> JAX weight converter.

Supports:
  * torchvision ResNet state_dicts (the reference's
    ``init_cfg=dict(type='Pretrained', checkpoint='torchvision://resnet50')``,
    config ``boosting_rcnn_r50_pafpn_1x_utdac.py:16``) -> backbone params;
  * full mmdet Boosting R-CNN checkpoints -> full detector params, for
    inference parity testing against released weights (SURVEY.md §7 stage 3).

Conventions: torch convs are OIHW, flax are HWIO; torch Linear is (out, in),
flax Dense kernel is (in, out).  BN runningstats land in ``batch_stats``.
"""
import os
import re
import sys
from typing import Any, Dict, Tuple

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _t_conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _t_fc(w):
    return np.transpose(np.asarray(w), (1, 0))


def _t_fc_after_pool(w, roi_feat_size: int = 7):
    """First FC after pooled RoI features: torch flattens (C, S, S)
    channel-major, flax flattens (S, S, C) channel-minor — permute the
    input dimension accordingly before the (out, in) -> (in, out)
    transpose."""
    w = np.asarray(w)
    out_dim, in_dim = w.shape
    s = roi_feat_size
    c = in_dim // (s * s)
    assert c * s * s == in_dim, (in_dim, s)
    w = w.reshape(out_dim, c, s, s).transpose(0, 2, 3, 1).reshape(out_dim, in_dim)
    return np.transpose(w, (1, 0))


def convert_torchvision_resnet(state_dict: Dict[str, Any]):
    """torchvision resnet -> (params, batch_stats) subtrees keyed by our
    module names (``layer{s}_{b}``, ``downsample_conv`` ...)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf_name, value):
        d = tree
        for p in path:
            d = d.setdefault(p, {})
        d[leaf_name] = value

    for k, v in state_dict.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if k.startswith("fc."):
            continue
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", k)
        if m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            mod = f"layer{stage}_{block}"
            if rest.startswith("downsample.0."):
                tgt, leaf = ("downsample_conv", rest.split(".")[-1])
            elif rest.startswith("downsample.1."):
                tgt, leaf = ("downsample_bn", rest.split(".")[-1])
            else:
                tgt, leaf = rest.split(".", 1)
            _assign_conv_or_bn(params, stats, [mod, tgt], leaf, v)
        elif k.startswith("conv1."):
            _assign_conv_or_bn(params, stats, ["conv1"], k.split(".", 1)[1], v)
        elif k.startswith("bn1."):
            _assign_conv_or_bn(params, stats, ["bn1"], k.split(".", 1)[1], v)
    return params, stats


def _assign_conv_or_bn(params, stats, path, leaf, v):
    def put(tree, path, leaf_name, value):
        d = tree
        for p in path:
            d = d.setdefault(p, {})
        d[leaf_name] = value

    if leaf == "conv_offset.weight":
        # mmcv DeformConv2dPack nests the offset conv inside conv2
        # (``backbone.layerX.Y.conv2.conv_offset.weight``); our DeformConv
        # names it ``conv_offset`` with an HWIO ``kernel``
        put(params, path + ["conv_offset"], "kernel", _t_conv(v))
    elif leaf == "conv_offset.bias":
        put(params, path + ["conv_offset"], "bias", v)
    elif leaf == "weight" and v.ndim == 4:
        put(params, path, "kernel", _t_conv(v))
    elif leaf == "weight":
        put(params, path, "scale", v)
    elif leaf == "bias":
        put(params, path, "bias", v)
    elif leaf == "running_mean":
        put(stats, path, "mean", v)
    elif leaf == "running_var":
        put(stats, path, "var", v)
    # num_batches_tracked ignored


def _merge_backbone_subtree(tree, sub):
    """Merge converted backbone leaves into ``tree['backbone']``.

    Wrapper backbones (HiddenMixupResNet) nest the ResNet one level down
    under ``resnet`` — descend, mirroring the frozen_stages_mask handling
    in ``engine/train.py``; merging at the backbone top level would leave
    the real weights random AND desync the grads tree from the opt_state
    inited on the original params."""
    new = dict(tree)
    merged = dict(new["backbone"])
    wrapper = None
    if "resnet" in merged and not any(
        k.startswith(("conv", "bn", "stem", "layer")) for k in merged
    ):
        wrapper = "resnet"
        merged = dict(merged["resnet"])
    for k, v in sub.items():
        merged[k] = _merge_leaves(merged.get(k, {}), v)
    if wrapper is not None:
        outer = dict(new["backbone"])
        outer[wrapper] = merged
        merged = outer
    new["backbone"] = merged
    return new


def _swin_merge_perm(c: int) -> np.ndarray:
    """Channel permutation torch->flax for PatchMerging's 4C features.

    The reference merges 2x2 patches with ``nn.Unfold`` (``mmdet/models/
    utils/transformer.py`` PatchMerging), whose channel order is
    channel-slowest: ``t = c*4 + (ky*2 + kx)``.  The flax PatchMerging
    concatenates blocks ``[x00, x10, x01, x11]`` (``o = block*C + c``,
    swin.py:140-143).  Returns ``perm`` with ``ours[o] = torch[perm[o]]``.
    """
    kmap = {0: 0, 1: 2, 2: 1, 3: 3}  # block -> unfold k=(ky*2+kx)
    return np.asarray(
        [c_ * 4 + kmap[blk] for blk in range(4) for c_ in range(c)],
        np.int64,
    )


def convert_swin_backbone(sd: Dict[str, Any]):
    """mmdet Swin backbone state dict -> flax SwinTransformer param tree.

    Key mapping (reference ``mmdet/models/backbones/swin.py``):

    torch                                         | flax
    ----------------------------------------------|----------------------
    patch_embed.projection.{weight,bias}          | patch_embed/{kernel,bias}
    patch_embed.norm.{weight,bias}                | patch_norm/{scale,bias}
    stages.S.blocks.B.norm{1,2}.*                 | stageS_blockB/norm{1,2}/*
    stages.S.blocks.B.attn.w_msa.qkv/proj.*       | stageS_blockB/attn/{qkv,proj}/*
    stages.S.blocks.B.attn.w_msa.rel..bias_table  | stageS_blockB/attn/relative_position_bias_table
    stages.S.blocks.B.ffn.layers.0.0 / layers.1   | stageS_blockB/{mlp_fc1,mlp_fc2}
    stages.S.downsample.norm / reduction          | mergeS/{norm,reduction} (4C permuted)
    norm{I}.{weight,bias} (out norms)             | out_normI/{scale,bias}

    ``relative_position_index`` buffers are recomputed (the mmdet
    double_step_seq+flip table equals the standard formula — asserted by
    tests/test_parity_swin.py); ``attn_mask`` buffers don't exist in the
    checkpoint (computed on the fly).
    """
    params: Dict[str, Any] = {}

    def put(path, leaf, v):
        d = params
        for p in path:
            d = d.setdefault(p, {})
        d[leaf] = v

    for k, v in sd.items():
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if k == "patch_embed.projection.weight":
            put(["patch_embed"], "kernel", _t_conv(v))
        elif k == "patch_embed.projection.bias":
            put(["patch_embed"], "bias", v)
        elif k.startswith("patch_embed.norm."):
            put(["patch_norm"],
                "scale" if k.endswith("weight") else "bias", v)
        elif k == "absolute_pos_embed":
            raise NotImplementedError(
                "absolute_pos_embed (use_abs_pos_embed=True) is not part of "
                "the Swin-T/S/B detection configs; unsupported")
        elif re.match(r"norm\d+\.(weight|bias)", k):
            m = re.match(r"norm(\d+)\.(weight|bias)", k)
            put([f"out_norm{m.group(1)}"],
                "scale" if m.group(2) == "weight" else "bias", v)
        elif k.startswith("stages."):
            m = re.match(r"stages\.(\d+)\.downsample\.(norm|reduction)\.(weight|bias)", k)
            if m:
                s, mod, leaf = int(m.group(1)), m.group(2), m.group(3)
                if mod == "reduction":  # (2C_out, 4C) -> (4C, 2C_out), rows permuted
                    perm = _swin_merge_perm(v.shape[1] // 4)
                    put([f"merge{s}", "reduction"], "kernel", v.T[perm])
                else:
                    perm = _swin_merge_perm(v.shape[0] // 4)
                    put([f"merge{s}", "norm"],
                        "scale" if leaf == "weight" else "bias", v[perm])
                continue
            m = re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.*)", k)
            if not m:
                continue
            s, b, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            blk = f"stage{s}_block{b}"
            if rest.startswith("norm1.") or rest.startswith("norm2."):
                norm, leaf = rest.split(".")
                put([blk, norm], "scale" if leaf == "weight" else "bias", v)
            elif rest == "attn.w_msa.relative_position_bias_table":
                put([blk, "attn"], "relative_position_bias_table", v)
            elif rest == "attn.w_msa.relative_position_index":
                continue  # recomputed constant
            elif rest.startswith("attn.w_msa.qkv."):
                leaf = rest.split(".")[-1]
                put([blk, "attn", "qkv"],
                    "kernel" if leaf == "weight" else "bias",
                    v.T if leaf == "weight" else v)
            elif rest.startswith("attn.w_msa.proj."):
                leaf = rest.split(".")[-1]
                put([blk, "attn", "proj"],
                    "kernel" if leaf == "weight" else "bias",
                    v.T if leaf == "weight" else v)
            elif rest.startswith("ffn.layers.0.0."):
                leaf = rest.split(".")[-1]
                put([blk, "mlp_fc1"],
                    "kernel" if leaf == "weight" else "bias",
                    v.T if leaf == "weight" else v)
            elif rest.startswith("ffn.layers.1."):
                leaf = rest.split(".")[-1]
                put([blk, "mlp_fc2"],
                    "kernel" if leaf == "weight" else "bias",
                    v.T if leaf == "weight" else v)
    return params, {}


def convert_mmdet_singlestage(sd: Dict[str, Any]):
    """mmdet single-stage checkpoint -> ``SingleStageNet`` trees
    (roots ``backbone``/``neck``/``head``).

    Covers the BASELINE-named anchor-head graphs (reference
    ``configs/atss/metafile.yml:39``, retinanet): ``bbox_head.{cls_convs,
    reg_convs}.N.{conv,gn}`` towers (mmdet ConvModule names its GN child
    ``gn``), ``atss_{cls,reg,centerness}`` / ``retina_{cls,reg}`` branch
    convs and per-level ``scales.N.scale``.  Backbone/neck reuse the
    two-stage mapping rules.
    """
    params: Dict[str, Any] = {"backbone": {}, "neck": {}, "head": {}}
    stats: Dict[str, Any] = {"backbone": {}}

    bb = {k[len("backbone."):]: sd[k] for k in sd if k.startswith("backbone.")}
    if any(k.startswith("patch_embed.projection") for k in bb):
        params["backbone"], stats["backbone"] = convert_swin_backbone(bb)
    else:
        params["backbone"], stats["backbone"] = convert_torchvision_resnet(bb)

    def put(root, path, leaf, v):
        d = params[root]
        for p in path:
            d = d.setdefault(p, {})
        d[leaf] = v

    for k, v in sd.items():
        if k.startswith("neck."):
            m = re.match(
                r"neck\.(lateral_convs|fpn_convs|downsample_convs|pafpn_convs)"
                r"\.(\d+)\.conv\.(weight|bias)", k)
            if not m:
                continue
            fam, idx, leaf = m.group(1), int(m.group(2)), m.group(3)
            name = {
                "lateral_convs": f"lateral_{idx}",
                "fpn_convs": f"fpn_conv_{idx}",
                "downsample_convs": f"downsample_{idx}",
                "pafpn_convs": f"pafpn_conv_{idx}",
            }[fam]
            put("neck", [name, "Conv_0"],
                "kernel" if leaf == "weight" else "bias",
                _t_conv(v) if leaf == "weight" else v)
        elif k.startswith("bbox_head."):
            m = re.match(
                r"bbox_head\.(cls|reg)_convs\.(\d+)\.conv\.(weight|bias)", k)
            if m:
                put("head", [f"{m.group(1)}_conv_{m.group(2)}", "Conv_0"],
                    "kernel" if m.group(3) == "weight" else "bias",
                    _t_conv(v) if m.group(3) == "weight" else v)
                continue
            m = re.match(
                r"bbox_head\.(cls|reg)_convs\.(\d+)\.gn\.(weight|bias)", k)
            if m:
                put("head", [f"{m.group(1)}_conv_{m.group(2)}", "GroupNorm_0"],
                    "scale" if m.group(3) == "weight" else "bias", v)
                continue
            m = re.match(
                r"bbox_head\.(atss_cls|atss_reg|atss_centerness|retina_cls|"
                r"retina_reg)\.(weight|bias)", k)
            if m:
                put("head", [m.group(1)],
                    "kernel" if m.group(2) == "weight" else "bias",
                    _t_conv(v) if m.group(2) == "weight" else v)
                continue
            m = re.match(r"bbox_head\.scales\.(\d+)\.scale", k)
            if m:
                put("head", [f"scale_{m.group(1)}"], "scale", v.reshape(()))
    return params, stats


def load_pretrained_backbone(checkpoint: str, params, batch_stats=None):
    """Load torchvision-style backbone weights into existing trees.

    ``torchvision://resnet50`` resolves through torchvision's model zoo when
    network access exists, else raises (caller falls back to random init).
    A local ``.pth`` path is also accepted.

    Returns ``(params, batch_stats)``.  The BN running statistics MUST be
    merged too: FrozenBatchNorm folds ``mean``/``var`` from the
    ``batch_stats`` collection (models/layers.py:49-54) — loading only the
    conv/scale/bias params would leave the pretrained features
    un-normalized (mean=0/var=1).  ``batch_stats=None`` returns ``None``
    stats for backward compatibility.
    """
    import torch

    if checkpoint.startswith("torchvision://"):
        name = checkpoint.split("://", 1)[1]
        import torchvision.models as tvm

        model = getattr(tvm, name)(weights="IMAGENET1K_V1")
        sd = model.state_dict()
    else:
        sd = torch.load(checkpoint, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
    bb_params, bb_stats = convert_torchvision_resnet(sd)
    new_params = _merge_backbone_subtree(params, bb_params)
    new_stats = None
    if batch_stats is not None and "backbone" in batch_stats:
        new_stats = _merge_backbone_subtree(batch_stats, bb_stats)
    elif batch_stats is not None:
        new_stats = batch_stats
    return new_params, new_stats


def _merge_leaves(dst, src):
    out = dict(dst)
    for k, v in src.items():
        out[k] = _merge_leaves(out.get(k, {}), v) if isinstance(v, dict) else v
    return out


def convert_mmdet_checkpoint(ckpt_path: str):
    """Full mmdet Boosting R-CNN checkpoint -> (params, batch_stats) trees
    matching ``TwoStageNet``'s module layout.  Mapping table:

    torch                                  | flax
    ---------------------------------------|--------------------------------
    backbone.*                             | backbone/* (torchvision rule)
    neck.lateral_convs.N.conv              | neck/lateral_N
    neck.fpn_convs.N.conv                  | neck/fpn_conv_N
    neck.downsample_convs.N.conv           | neck/downsample_N
    neck.pafpn_convs.N.conv                | neck/pafpn_conv_N
    rpn_head.rpn_convs.N.{conv,gn}         | rpn/rpn_conv_N/{Conv_0,GroupNorm_0}
    rpn_head.{rpn_cls,rpn_reg,rpn_iou}     | rpn/{rpn_cls,rpn_reg,rpn_iou}
    rpn_head.scales.N.scale                | rpn/scale_N/scale
    roi_head.bbox_head.shared_fcs.N        | bbox_head/shared_fc_N
    roi_head.bbox_head.{fc_cls,fc_reg}     | bbox_head/{fc_cls,fc_reg}
    """
    import torch

    sd = torch.load(ckpt_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}

    if (any(k.startswith("bbox_head.") for k in sd)
            and not any(k.startswith(("rpn_head.", "roi_head.")) for k in sd)):
        return convert_mmdet_singlestage(sd)

    params: Dict[str, Any] = {"backbone": {}, "neck": {}, "rpn": {}, "bbox_head": {}}
    stats: Dict[str, Any] = {"backbone": {}}

    bb = {k[len("backbone."):]: sd[k] for k in sd if k.startswith("backbone.")}
    import torch as _t

    if any(k.startswith("patch_embed.projection") for k in bb):
        params["backbone"], stats["backbone"] = convert_swin_backbone(bb)
    else:
        params["backbone"], stats["backbone"] = convert_torchvision_resnet(bb)

    def put(root, path, leaf, v):
        d = params[root]
        for p in path:
            d = d.setdefault(p, {})
        d[leaf] = v

    for k, v in sd.items():
        if k.startswith("neck."):
            m = re.match(
                r"neck\.(lateral_convs|fpn_convs|downsample_convs|pafpn_convs)\.(\d+)\.conv\.(weight|bias)",
                k,
            )
            if not m:
                continue
            fam, idx, leaf = m.group(1), int(m.group(2)), m.group(3)
            name = {
                "lateral_convs": f"lateral_{idx}",
                "fpn_convs": f"fpn_conv_{idx}",
                "downsample_convs": f"downsample_{idx}",
                "pafpn_convs": f"pafpn_conv_{idx}",
            }[fam]
            put("neck", [name, "Conv_0"], "kernel" if leaf == "weight" else "bias",
                _t_conv(v) if leaf == "weight" else v)
        elif k.startswith("rpn_head."):
            m = re.match(r"rpn_head\.rpn_convs\.(\d+)\.conv\.(weight|bias)", k)
            if m:
                put("rpn", [f"rpn_conv_{m.group(1)}", "Conv_0"],
                    "kernel" if m.group(2) == "weight" else "bias",
                    _t_conv(v) if m.group(2) == "weight" else v)
                continue
            m = re.match(r"rpn_head\.rpn_convs\.(\d+)\.gn\.(weight|bias)", k)
            if m:
                put("rpn", [f"rpn_conv_{m.group(1)}", "GroupNorm_0"],
                    "scale" if m.group(2) == "weight" else "bias", v)
                continue
            m = re.match(r"rpn_head\.(rpn_cls|rpn_reg|rpn_iou)\.(weight|bias)", k)
            if m:
                put("rpn", [m.group(1)], "kernel" if m.group(2) == "weight" else "bias",
                    _t_conv(v) if m.group(2) == "weight" else v)
                continue
            m = re.match(r"rpn_head\.scales\.(\d+)\.scale", k)
            if m:
                put("rpn", [f"scale_{m.group(1)}"], "scale", v.reshape(()))
        elif k.startswith("roi_head.shared_head.layer4."):
            # C4 shared res5 head (reference roi_heads/shared_heads/
            # res_layer.py): torch roi_head.shared_head.layer4.{b}.* ->
            # bbox_head/res5_{b}/* (Res5BBoxHead block naming)
            m = re.match(r"roi_head\.shared_head\.layer4\.(\d+)\.(.*)", k)
            if not m:
                continue
            b, rest = int(m.group(1)), m.group(2)
            if rest.startswith("downsample.0."):
                tgt, leaf = "down_conv", rest.split(".")[-1]
            elif rest.startswith("downsample.1."):
                tgt, leaf = "down_bn", rest.split(".")[-1]
            else:
                tgt, leaf = rest.split(".", 1)
            params.setdefault("bbox_head", {})
            stats.setdefault("bbox_head", {})
            _assign_conv_or_bn(
                params["bbox_head"], stats["bbox_head"],
                [f"res5_{b}", tgt], leaf, v)
        elif re.match(r"roi_head\.bbox_head\.\d+\.", k):
            # cascade: roi_head.bbox_head.N.* -> bbox_heads_N/* (flax tuple
            # submodule naming of CascadeNet.bbox_heads)
            m = re.match(
                r"roi_head\.bbox_head\.(\d+)\.shared_fcs\.(\d+)\.(weight|bias)", k)
            if m:
                stage, idx, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
                root = f"bbox_heads_{stage}"
                params.setdefault(root, {})
                if leaf == "weight":
                    w = _t_fc_after_pool(v) if idx == 0 else _t_fc(v)
                else:
                    w = v
                put(root, [f"shared_fc_{idx}"],
                    "kernel" if leaf == "weight" else "bias", w)
                continue
            m = re.match(
                r"roi_head\.bbox_head\.(\d+)\.(fc_cls|fc_reg)\.(weight|bias)", k)
            if m:
                root = f"bbox_heads_{int(m.group(1))}"
                params.setdefault(root, {})
                put(root, [m.group(2)],
                    "kernel" if m.group(3) == "weight" else "bias",
                    _t_fc(v) if m.group(3) == "weight" else v)
        elif k.startswith("roi_head.mask_head."):
            params.setdefault("mask_head", {})
            m = re.match(
                r"roi_head\.mask_head\.convs\.(\d+)\.conv\.(weight|bias)", k)
            if m:
                put("mask_head", [f"conv_{int(m.group(1))}"],
                    "kernel" if m.group(2) == "weight" else "bias",
                    _t_conv(v) if m.group(2) == "weight" else v)
                continue
            m = re.match(r"roi_head\.mask_head\.upsample\.(weight|bias)", k)
            if m:
                # torch ConvTranspose2d weight is (in, out, kh, kw); flax
                # ConvTranspose kernel is (kh, kw, in, out) AND flax's
                # conv_transpose does not flip the kernel while torch's
                # gradient-of-conv formulation effectively does — so
                # transpose + rotate 180 spatially (verified numerically)
                put("mask_head", ["upsample"],
                    "kernel" if m.group(1) == "weight" else "bias",
                    np.ascontiguousarray(
                        v.transpose(2, 3, 0, 1)[::-1, ::-1])
                    if m.group(1) == "weight" else v)
                continue
            m = re.match(r"roi_head\.mask_head\.conv_logits\.(weight|bias)", k)
            if m:
                put("mask_head", ["conv_logits"],
                    "kernel" if m.group(1) == "weight" else "bias",
                    _t_conv(v) if m.group(1) == "weight" else v)
        elif k.startswith("roi_head.bbox_head."):
            m = re.match(r"roi_head\.bbox_head\.shared_fcs\.(\d+)\.(weight|bias)", k)
            if m:
                idx, leaf = int(m.group(1)), m.group(2)
                if leaf == "weight":
                    # fc 0 consumes the flattened pooled features: fix the
                    # CHW-flat (torch) vs HWC-flat (flax) input ordering
                    w = _t_fc_after_pool(v) if idx == 0 else _t_fc(v)
                else:
                    w = v
                put("bbox_head", [f"shared_fc_{idx}"],
                    "kernel" if leaf == "weight" else "bias", w)
                continue
            m = re.match(r"roi_head\.bbox_head\.(fc_cls|fc_reg)\.(weight|bias)", k)
            if m:
                put("bbox_head", [m.group(1)],
                    "kernel" if m.group(2) == "weight" else "bias",
                    _t_fc(v) if m.group(2) == "weight" else v)
    return params, stats


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    args = ap.parse_args()
    p, s = convert_mmdet_checkpoint(args.checkpoint)
    np.savez(args.out, **{"__tree__": np.array([], dtype=object)})
    import pickle

    with open(args.out, "wb") as f:
        pickle.dump({"params": p, "batch_stats": s}, f)
    print(f"wrote {args.out}")
