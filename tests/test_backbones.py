"""Backbone shape/property tests (reference ``tests/test_models/test_backbones``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.models.backbones.resnet import ResNet
from boosting_rcnn_tpu.models.backbones.swin import (
    SwinTransformer,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


@pytest.mark.slow
def test_resnet50_shapes():
    m = ResNet(depth=50, base_channels=8)
    x = jnp.zeros((1, 64, 96, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 4
    # strides 4, 8, 16, 32; channels base*4*2^i for bottleneck
    for i, o in enumerate(outs):
        assert o.shape == (1, 64 // (4 * 2**i), 96 // (4 * 2**i), 8 * 4 * 2**i)


def test_resnet18_basic_blocks():
    m = ResNet(depth=18, base_channels=8)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert outs[-1].shape == (1, 1, 1, 64)


def test_resnext_grouped():
    m = ResNet(depth=50, base_channels=8, groups=4, base_width=4)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert outs[-1].shape[-1] == 8 * 4 * 8


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.rand(2, 14, 28, 5).astype(np.float32))
    win = window_partition(x, 7)
    assert win.shape == (2 * 2 * 4, 49, 5)
    back = window_reverse(win, 7, 14, 28)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shifted_mask_blocks_cross_region():
    mask = shifted_window_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # first window (no boundary) fully visible
    assert (mask[0] == 0).all()
    # boundary windows must mask something
    assert (mask[-1] < 0).any()


@pytest.mark.slow
def test_swin_tiny_shapes():
    m = SwinTransformer(embed_dims=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    x = jnp.zeros((1, 56, 84, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 14, 21, 16)
    assert outs[1].shape == (1, 7, 11, 32)
    assert outs[3].shape[-1] == 128
    n = sum(v.size for v in jax.tree.leaves(vars_["params"]))
    assert n > 0


def test_swin_nondivisible_input():
    # canvas not divisible by window*patch — padding must keep it working
    m = SwinTransformer(embed_dims=8, depths=(1, 1), num_heads=(1, 2))
    x = jnp.zeros((1, 50, 61, 3))
    vars_ = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(vars_, x)
    assert outs[0].shape[1:3] == (13, 16)  # ceil(50/4), ceil(61/4)


@pytest.mark.slow
def test_mobilenet_v2_shapes():
    """MobileNetV2 (reference mobilenet_v2.py): default out_indices give
    stride-4/8/16/32 maps with the widened channel counts."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.mobilenet_v2 import MobileNetV2

    m = MobileNetV2(widen_factor=1.0)
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes[0] == (1, 16, 24, 24)   # stride 4, c 24
    assert shapes[1] == (1, 8, 12, 32)    # stride 8, c 32
    assert shapes[2] == (1, 4, 6, 96)     # stride 16, c 96
    assert shapes[3] == (1, 2, 3, 1280)   # stride 32, out conv 1280


def test_regnet_widths_and_shapes():
    """RegNet (reference regnet.py): quantized-linear width schedule golden
    for regnetx_400mf + output strides/channels."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.regnet import (
        RegNet,
        adjust_groups,
        generate_regnet,
    )

    widths, depths = generate_regnet(24, 24.48, 2.54, 22)
    widths, groups = adjust_groups(widths, 16)
    # published regnetx_400mf stage widths
    assert widths == [32, 64, 160, 384]
    assert sum(depths) == 22

    m = RegNet(arch="regnetx_400mf")
    x = jnp.zeros((1, 64, 96, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [32, 64, 160, 384]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]  # strides 4..32


@pytest.mark.slow
def test_hrnet_and_hrfpn_shapes():
    """HRNet w18 (reference hrnet.py): 4 parallel branches at strides
    4/8/16/32 with the arch channel widths; HRFPN emits 5 uniform levels."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.hrnet import HRNet
    from boosting_rcnn_tpu.models.necks.fpn import HRFPN

    m = HRNet(arch="w18")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(v, x)
    assert [o.shape[-1] for o in outs] == [18, 36, 72, 144]
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2]

    neck = HRFPN(out_channels=32, num_outs=5)
    nv = neck.init(jax.random.PRNGKey(0), outs)
    ps = neck.apply(nv, outs)
    assert len(ps) == 5
    assert [p.shape[1] for p in ps] == [16, 8, 4, 2, 1]
    assert all(p.shape[-1] == 32 for p in ps)


def test_nasfpn_shapes():
    """NAS-FPN (reference nas_fpn.py): discovered merge schedule keeps the
    5-level pyramid shapes."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.necks.fpn import NASFPN

    neck = NASFPN(out_channels=16, num_outs=5, stack_times=2, start_level=1)
    ins = tuple(
        jnp.zeros((1, s, s + s // 2, c))
        for s, c in ((32, 8), (16, 16), (8, 32), (4, 64))
    )
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 16 for o in outs)


@pytest.mark.slow
def test_resnest_shapes_and_grad():
    """ResNeSt (reference resnest.py): V1d stem + split-attention
    bottlenecks keep standard C2..C5 strides/channels."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.resnest import ResNeSt

    net = ResNeSt(depth=50, base_channels=8, stem_channels=8,
                  frozen_stages=-1, norm_eval=True)
    x = jnp.ones((1, 64, 96, 3))
    v = net.init(jax.random.PRNGKey(0), x)
    outs = net.apply(v, x)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 32), (1, 8, 12, 64), (1, 4, 6, 128), (1, 2, 3, 256)
    ]
    g = jax.grad(lambda p: sum(o.sum() for o in net.apply(p, x)))(v)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in leaves)


def test_carafe_op_matches_naive():
    """CARAFE reassembly (mmcv carafe): einsum-of-patches form must equal a
    naive per-pixel weighted window sum."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.ops.carafe import carafe, normalize_masks

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 5, 3).astype(np.float32))
    raw = jnp.asarray(rng.randn(1, 8, 10, 9).astype(np.float32))
    masks = normalize_masks(raw)
    out = np.asarray(carafe(x, masks, 3, 2))
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.zeros((1, 8, 10, 3), np.float32)
    m = np.asarray(masks)
    for i in range(8):
        for j in range(10):
            si, sj = i // 2, j // 2
            win = xp[0, si:si + 3, sj:sj + 3, :]  # (3,3,C)
            w = m[0, i, j].reshape(3, 3)
            want[0, i, j] = (win * w[..., None]).sum(axis=(0, 1))
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_fpn_carafe_shapes():
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.necks.fpn import FPNCarafe

    neck = FPNCarafe(out_channels=16, num_outs=5, start_level=0)
    ins = tuple(
        jnp.zeros((1, s, s + s // 2, c))
        for s, c in ((32, 8), (16, 16), (8, 32), (4, 64))
    )
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 16 for o in outs)


@pytest.mark.slow
def test_pvt_v1_v2_shapes():
    """PVT (reference pvt.py): 4-stage pyramid at strides 4/8/16/32 with
    dims embed*heads; v2 adds overlapping patches + conv-FFN."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.pvt import PVT

    for v2 in (False, True):
        net = PVT(
            embed_dims=8, num_layers=(1, 1, 1, 1),
            patch_sizes=(7, 3, 3, 3) if v2 else (4, 2, 2, 2),
            use_abs_pos_embed=not v2, use_conv_ffn=v2, norm_after_stage=v2,
        )
        x = jnp.ones((1, 64, 96, 3))
        var = net.init(jax.random.PRNGKey(0), x)
        outs = net.apply(var, x)
        assert [o.shape[1] for o in outs] == [16, 8, 4, 2], v2
        assert [o.shape[-1] for o in outs] == [8, 16, 40, 64], v2


def test_detectors_sac_rfp():
    """DetectoRS (reference detectors_resnet.py + rfp.py): SAC backbone with
    output_img + RFP neck produce the standard 5-level pyramid; the zero-init
    gate makes step-2 a 50/50 blend at init."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.backbones.detectors_resnet import (
        DetectoRSResNet,
    )
    from boosting_rcnn_tpu.models.necks.fpn import RFP

    bb = DetectoRSResNet(depth=50, base_channels=8, frozen_stages=-1,
                         output_img=True)
    rfp_bb = DetectoRSResNet(depth=50, base_channels=8, frozen_stages=-1)
    neck = RFP(in_channels=(32, 64, 128, 256), rfp_backbone=rfp_bb,
               out_channels=16, rfp_steps=2)
    x = jnp.ones((1, 64, 96, 3))
    vb = bb.init(jax.random.PRNGKey(0), x)
    outs = bb.apply(vb, x)
    assert len(outs) == 5 and outs[0].shape == x.shape
    vn = neck.init(jax.random.PRNGKey(1), outs)
    levels = neck.apply(vn, outs)
    assert [o.shape[1] for o in levels] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 16 for o in levels)


@pytest.mark.slow
def test_detectors_cascade_build_loss():
    """DetectoRS config (reference configs/detectors/): cascade R-CNN over
    SAC+RFP builds, trains a step and predicts."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    cfg = load_config(
        "configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py")
    mc = cfg.model.to_dict()
    mc["backbone"].update(base_channels=8, frozen_stages=-1)
    mc["neck"]["rfp_backbone"].update(base_channels=8, frozen_stages=-1)
    mc["neck"].update(in_channels=[32, 64, 128, 256], out_channels=16)
    mc["rpn_head"].update(feat_channels=16)
    for h in mc["roi_head"]["bbox_head"]:
        h.update(fc_out_channels=16, num_classes=4)
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=64, max_per_img=16)
    for st in mc["train_cfg"]["rcnn"]:
        st["sampler"]["num"] = 8
    mc["test_cfg"]["rpn"].update(nms_pre=32, max_per_img=8)
    det = build_detector(mc)
    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, anchors, nla)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, anchors, nla)[:3]
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


def test_fpg_shapes_and_train_stats():
    """FPG (reference fpg.py): 9 bottom-up stacks with skip staircase keep
    the 5-level pyramid; BN transitions update stats in train mode."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.necks.fpn import FPG

    neck = FPG(out_channels=16, inter_channels=16, num_outs=5,
               stack_times=3, skip_inds=((0, 1), (0,), (), (), ()))
    ins = tuple(
        jnp.zeros((1, s, s + s // 2, c))
        for s, c in ((32, 8), (16, 16), (8, 32), (4, 64))
    )
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs, mut = neck.apply(v, ins, mutable=["batch_stats"])
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 16 for o in outs)
    assert "batch_stats" in v


def test_retina_sepbn_shares_convs_separates_bn():
    """RetinaSepBN (reference retina_sepbn_head.py): conv kernels shared
    across levels, one BN stats set per level."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.dense_heads.retina_head import RetinaConvs

    head = RetinaConvs(num_classes=4, num_anchors=1, feat_channels=8,
                       stacked_convs=2, sep_bn=True)
    feats = tuple(jnp.ones((1, s, s, 8)) for s in (16, 8, 4))
    v = head.init(jax.random.PRNGKey(0), feats)
    params = v["params"]
    assert "batch_stats" in v
    # one shared conv kernel, per-level bn stats
    assert "cls_conv_0" in params
    bn_names = [k for k in v["batch_stats"] if k.startswith("cls_bn_l")]
    assert len(bn_names) == 2 * 3  # levels x stacked
    outs = head.apply(v, feats)
    assert len(outs[0]) == 3


@pytest.mark.slow
def test_nasfcos_fpn_and_head():
    """NAS-FCOS (reference nasfcos_fpn.py + nasfcos_head.py): concat-cell
    pyramid shapes + searched DCNv2 tower detector smoke."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.data.loader import FakeDetLoader

    mc = dict(
        type="NASFCOS",
        backbone=dict(type="ResNet", depth=18, base_channels=8,
                      frozen_stages=-1),
        neck=dict(type="NASFCOS_FPN", out_channels=32, num_outs=5,
                  start_level=1),
        bbox_head=dict(type="NASFCOSHead", num_classes=4,
                       feat_channels=32),
        test_cfg=dict(score_thr=0.05, max_per_img=8,
                      nms=dict(iou_threshold=0.6)),
    )
    det = build_detector(mc)
    canvas = (64, 96)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    pack, nlp = det.anchors_for(canvas)
    batch = next(FakeDetLoader(1, canvas, 4, num_batches=1).epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = det.loss(variables, jax.random.PRNGKey(1), batch, pack, nlp)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    dets, labels, valid = det.predict(variables, batch, pack, nlp)
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_fpt_shapes():
    """FPT (fork necks/fpt.py): attention pyramid keeps standard levels,
    fine->coarse order."""
    import jax
    import jax.numpy as jnp

    from boosting_rcnn_tpu.models.necks.fpt import FPT

    neck = FPT(out_channels=32, num_outs=5)
    ins = tuple(
        jnp.ones((1, s, s + s // 2, c))
        for s, c in ((32, 8), (16, 16), (8, 32), (4, 64))
    )
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs, _ = neck.apply(v, ins, mutable=["batch_stats"])
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert all(o.shape[-1] == 32 for o in outs)
