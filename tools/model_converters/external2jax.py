"""Import external pretrained backbones (reference
``tools/model_converters/selfsup2mmdet.py`` and ``regnet2mmdet.py``).

Two sources:

* ``--selfsup moco|swav`` — self-supervised torchvision-ResNet
  checkpoints.  MoCo v2 stores the backbone under ``module.encoder_q.``
  (reference ``selfsup2mmdet.py:8-25`` strips that prefix); SwAV releases
  plain (or ``module.``-prefixed) keys and "does not need to convert the
  keys" (``selfsup2mmdet.py:36-38``).  Output is a torch ``.pth`` with
  torchvision-style keys, directly consumable by
  ``init_cfg=dict(type='Pretrained', checkpoint=<dst>)`` through
  ``tools/convert_torch_weights.load_pretrained_backbone`` — the path the
  rebuilt ``configs/selfsup_pretrain/`` family uses.

* ``--regnet`` — pycls RegNetX checkpoints (reference
  ``regnet2mmdet.py``: ``stem.conv/bn`` -> stem, ``s{X}.b{Y}.proj/bn`` ->
  downsample, ``s{X}.b{Y}.f.{a,b,c}[_bn]`` -> the three bottleneck
  convs).  Here the target is the flax ``RegNet`` module directly
  (``models/backbones/regnet.py`` names: ``conv1``/``bn1`` stem,
  ``layer{X}_{Y-1}.conv{1,2,3}/bn{1,2,3}``, ``downsample_conv``/
  ``downsample_bn``), emitted as ``(params, batch_stats)`` subtrees in an
  ``.npz`` and mergeable via :func:`load_regnet_npz`.
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def selfsup_convert(src: str, dst: str, mode: str):
    """Strip the self-sup wrapper prefixes -> torchvision-style ``.pth``."""
    import torch

    blobs = torch.load(src, map_location="cpu")
    if "state_dict" in blobs:
        blobs = blobs["state_dict"]
    out = {}
    for k, v in blobs.items():
        if mode == "moco":
            if not k.startswith("module.encoder_q."):
                continue
            k = k[len("module.encoder_q."):]
        elif k.startswith("module."):
            k = k[len("module."):]
        if k.startswith(("fc.", "projection", "prototypes")):
            continue  # contrastive heads, not backbone
        out[k] = v
    torch.save({"state_dict": out}, dst)
    return out


def regnet_convert_tree(sd):
    """pycls state dict -> (params, batch_stats) trees for flax RegNet."""
    from tools.convert_torch_weights import _t_conv

    params, stats = {}, {}

    def put(tree, path, leaf, v):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = np.asarray(v)

    def put_conv(path, name, v):
        put(params, path + [name], "kernel", _t_conv(v))

    def put_bn(path, name, leaf, v):
        if leaf == "weight":
            put(params, path + [name], "scale", v)
        elif leaf == "bias":
            put(params, path + [name], "bias", v)
        elif leaf == "running_mean":
            put(stats, path + [name], "mean", v)
        elif leaf == "running_var":
            put(stats, path + [name], "var", v)

    for k, v in sd.items():
        v = np.asarray(v.cpu() if hasattr(v, "cpu") else v)
        if k.startswith("head."):
            continue  # classifier
        m = re.match(r"stem\.conv\.weight$", k)
        if m:
            put_conv([], "conv1", v)
            continue
        m = re.match(r"stem\.bn\.(\w+)$", k)
        if m:
            put_bn([], "bn1", m.group(1), v)
            continue
        m = re.match(r"s(\d+)\.b(\d+)\.(.*)$", k)
        if not m:
            continue
        block = [f"layer{int(m.group(1))}_{int(m.group(2)) - 1}"]
        rest = m.group(3)
        if rest == "proj.weight":
            put_conv(block, "downsample_conv", v)
        elif rest.startswith("bn."):
            put_bn(block, "downsample_bn", rest.split(".", 1)[1], v)
        elif rest.startswith("f."):
            sub = rest[2:]
            branch, leaf = sub.split(".", 1)
            name_map = {"a": "conv1", "b": "conv2", "c": "conv3",
                        "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}
            tgt = name_map[branch]
            if branch in ("a", "b", "c"):
                put_conv(block, tgt, v)
            else:
                put_bn(block, tgt, leaf, v)
    return params, stats


def _flatten(tree, prefix=""):
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            yield from _flatten(v, p)
        else:
            yield p, v


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def regnet_convert(src: str, dst: str):
    import torch

    sd = torch.load(src, map_location="cpu")
    if "model_state" in sd:  # pycls wraps under model_state
        sd = sd["model_state"]
    elif "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = regnet_convert_tree(sd)
    flat = {f"params/{k}": v for k, v in _flatten(params)}
    flat.update({f"batch_stats/{k}": v for k, v in _flatten(stats)})
    np.savez(dst, **flat)
    return params, stats


def load_regnet_npz(path: str, variables):
    """Merge a converted RegNet ``.npz`` into a detector's variables
    (backbone subtree), mirroring ``load_pretrained_backbone``."""
    from tools.convert_torch_weights import _merge_leaves

    flat = dict(np.load(path))
    tree = _unflatten(flat)
    out = dict(variables)
    for col in ("params", "batch_stats"):
        if col not in tree:
            continue
        cur = dict(out.get(col, {}))
        cur["backbone"] = _merge_leaves(cur.get("backbone", {}), tree[col])
        out[col] = cur
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--selfsup", choices=["moco", "swav"])
    ap.add_argument("--regnet", action="store_true")
    args = ap.parse_args()
    if args.regnet:
        params, stats = regnet_convert(args.src, args.dst)
        n = sum(1 for _ in _flatten(params)) + sum(1 for _ in _flatten(stats))
        print(f"converted {n} regnet leaves -> {args.dst}")
    elif args.selfsup:
        out = selfsup_convert(args.src, args.dst, args.selfsup)
        print(f"converted {len(out)} backbone keys -> {args.dst}")
    else:
        ap.error("one of --selfsup / --regnet is required")


if __name__ == "__main__":
    main()
