"""External-checkpoint importers (reference tools/model_converters/
selfsup2mmdet.py + regnet2mmdet.py): round-trip against the flax modules'
own init trees — every converted leaf must land on an existing param with
the right shape.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.model_converters.external2jax import (
    _flatten,
    regnet_convert_tree,
    selfsup_convert,
)


def _tree_shapes(tree):
    return {k: tuple(v.shape) for k, v in _flatten(tree)}


def _synth_pycls_from_flax(params, stats):
    """Reverse-map a flax RegNet tree to a pycls-layout state dict."""
    sd = {}

    def conv_back(v):
        return np.transpose(np.asarray(v), (3, 2, 0, 1))

    name_back = {"conv1": "f.a", "conv2": "f.b", "conv3": "f.c",
                 "bn1": "f.a_bn", "bn2": "f.b_bn", "bn3": "f.c_bn",
                 "downsample_conv": "proj", "downsample_bn": "bn"}

    for path, v in _flatten(params):
        parts = path.split("/")
        if parts[0] == "conv1":
            sd["stem.conv.weight"] = conv_back(v)
        elif parts[0] == "bn1":
            leaf = "weight" if parts[1] == "scale" else "bias"
            sd[f"stem.bn.{leaf}"] = np.asarray(v)
        else:
            stage, block = parts[0][len("layer"):].split("_")
            base = f"s{stage}.b{int(block) + 1}.{name_back[parts[1]]}"
            if parts[2] == "kernel":
                sd[f"{base}.weight"] = conv_back(v)
            else:
                leaf = "weight" if parts[2] == "scale" else "bias"
                sd[f"{base}.{leaf}"] = np.asarray(v)
    for path, v in _flatten(stats):
        parts = path.split("/")
        leaf = "running_mean" if parts[-1] == "mean" else "running_var"
        if parts[0] == "bn1":
            sd[f"stem.bn.{leaf}"] = np.asarray(v)
        else:
            stage, block = parts[0][len("layer"):].split("_")
            sd[f"s{stage}.b{int(block) + 1}.{name_back[parts[1]]}.{leaf}"] = (
                np.asarray(v))
    sd["head.fc.weight"] = np.zeros((1000, 8), np.float32)  # must be skipped
    return sd


def test_regnet_pycls_round_trip():
    from boosting_rcnn_tpu.models.backbones.regnet import RegNet

    m = RegNet(arch="regnetx_400mf", norm_eval=True)
    variables = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    want_p = _tree_shapes(variables["params"])
    want_s = _tree_shapes(variables["batch_stats"])

    sd = _synth_pycls_from_flax(variables["params"], variables["batch_stats"])
    got_p, got_s = regnet_convert_tree(sd)
    assert _tree_shapes(got_p) == want_p
    assert _tree_shapes(got_s) == want_s
    # values survive the layout round-trip
    flat_want = dict(_flatten(variables["params"]))
    flat_got = dict(_flatten(got_p))
    for k in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_want[k]), flat_got[k], atol=1e-6)


def test_selfsup_moco_strip(tmp_path):
    torch = __import__("torch")
    sd = {
        "module.encoder_q.conv1.weight": torch.zeros(8, 3, 7, 7),
        "module.encoder_q.layer1.0.conv1.weight": torch.zeros(8, 8, 3, 3),
        "module.encoder_q.fc.0.weight": torch.zeros(16, 8),
        "module.encoder_k.conv1.weight": torch.ones(8, 3, 7, 7),  # dropped
        "queue": torch.zeros(4),  # dropped
    }
    src = tmp_path / "moco.pth"
    dst = tmp_path / "out.pth"
    torch.save({"state_dict": sd}, str(src))
    out = selfsup_convert(str(src), str(dst), "moco")
    assert set(out) == {"conv1.weight", "layer1.0.conv1.weight"}
    reloaded = torch.load(str(dst), map_location="cpu")["state_dict"]
    assert set(reloaded) == set(out)


def test_selfsup_swav_passthrough(tmp_path):
    torch = __import__("torch")
    sd = {
        "module.conv1.weight": torch.zeros(8, 3, 7, 7),
        "module.prototypes.weight": torch.zeros(30, 12),  # dropped
    }
    src = tmp_path / "swav.pth"
    dst = tmp_path / "out.pth"
    torch.save(sd, str(src))
    out = selfsup_convert(str(src), str(dst), "swav")
    assert set(out) == {"conv1.weight"}


def _path_keys(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return sorted(
        "/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat
    )


def test_load_pretrained_backbone_wrapper_descent_and_stats(tmp_path):
    """Advisor r3 (DMC config): HiddenMixupResNet nests the ResNet under
    backbone/resnet — load_pretrained_backbone must descend into the
    wrapper (top-level merging leaves the real weights random and adds
    stray siblings that desync grads from opt_state) AND must merge the BN
    running statistics into batch_stats (FrozenBatchNorm folds mean/var
    from there; params-only loading leaves features un-normalized)."""
    import torch

    from boosting_rcnn_tpu.models.backbones.resnet import ResNet
    from boosting_rcnn_tpu.models.thesis_extras import HiddenMixupResNet
    from tools.convert_torch_weights import load_pretrained_backbone

    m = HiddenMixupResNet(
        resnet=ResNet(depth=18, base_channels=8, frozen_stages=-1))
    variables = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    params = {"backbone": dict(variables["params"])}
    stats = {"backbone": dict(variables["batch_stats"])}
    assert "resnet" in params["backbone"], "wrapper level expected"

    w = torch.arange(8 * 3 * 7 * 7, dtype=torch.float32).reshape(8, 3, 7, 7)
    rm = torch.full((8,), 3.0)
    sd = {
        "conv1.weight": w,
        "bn1.weight": torch.full((8,), 2.0),
        "bn1.bias": torch.full((8,), -1.0),
        "bn1.running_mean": rm,
        "bn1.running_var": torch.full((8,), 0.5),
    }
    pth = tmp_path / "bb.pth"
    torch.save(sd, str(pth))

    new_p, new_s = load_pretrained_backbone(str(pth), params, stats)
    # no structural drift: same leaves before and after
    assert _path_keys(new_p) == _path_keys(params)
    assert _path_keys(new_s) == _path_keys(stats)
    # the wrapped resnet actually received the weights (HWIO transpose)
    got = np.asarray(new_p["backbone"]["resnet"]["conv1"]["kernel"])
    np.testing.assert_allclose(
        got, w.numpy().transpose(2, 3, 1, 0), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_p["backbone"]["resnet"]["bn1"]["scale"]), 2.0)
    # running stats landed in batch_stats
    np.testing.assert_allclose(
        np.asarray(new_s["backbone"]["resnet"]["bn1"]["mean"]), 3.0)
    np.testing.assert_allclose(
        np.asarray(new_s["backbone"]["resnet"]["bn1"]["var"]), 0.5)

    # plain (unwrapped) ResNet trees keep working
    params2 = {"backbone": dict(variables["params"]["resnet"])}
    stats2 = {"backbone": dict(variables["batch_stats"]["resnet"])}
    new_p2, new_s2 = load_pretrained_backbone(str(pth), params2, stats2)
    assert _path_keys(new_p2) == _path_keys(params2)
    np.testing.assert_allclose(
        np.asarray(new_s2["backbone"]["bn1"]["mean"]), 3.0)
