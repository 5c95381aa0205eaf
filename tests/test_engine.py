"""Engine tests: LR schedule, optimizer masking, checkpoint round trip,
EMA, train-step integration on the virtual mesh."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.engine.train import (
    TrainState,
    create_train_state,
    frozen_stages_mask,
    make_optimizer,
    step_lr_schedule,
)


def test_step_lr_schedule():
    sched = step_lr_schedule(0.02, steps_per_epoch=100, decay_epochs=(8, 11),
                             warmup_iters=500, warmup_ratio=0.001)
    assert float(sched(0)) == pytest.approx(0.02 * 0.001)
    assert float(sched(250)) == pytest.approx(0.02 * (0.001 + 0.999 * 0.5), rel=1e-4)
    assert float(sched(600)) == pytest.approx(0.02)
    assert float(sched(850)) == pytest.approx(0.002, rel=1e-5)  # after epoch 8
    assert float(sched(1150)) == pytest.approx(0.0002, rel=1e-5)  # after 11


def test_frozen_stages_mask():
    params = {
        "backbone": {
            "conv1": {"kernel": jnp.zeros(1)},
            "bn1": {"scale": jnp.zeros(1)},
            "layer1_0": {"conv1": {"kernel": jnp.zeros(1)}},
            "layer2_0": {"conv1": {"kernel": jnp.zeros(1)}},
        },
        "neck": {"lateral_0": {"Conv_0": {"kernel": jnp.zeros(1)}}},
    }
    m = frozen_stages_mask(params, frozen_stages=1)
    assert m["backbone"]["conv1"]["kernel"] is True
    assert m["backbone"]["bn1"]["scale"] is True
    assert m["backbone"]["layer1_0"]["conv1"]["kernel"] is True
    assert m["backbone"]["layer2_0"]["conv1"]["kernel"] is False
    assert m["neck"]["lateral_0"]["Conv_0"]["kernel"] is False


def test_frozen_params_do_not_move():
    params = {
        "backbone": {
            "conv1": {"kernel": jnp.ones(4)},
            "layer2_0": {"conv1": {"kernel": jnp.ones(4)}},
        },
    }
    tx = make_optimizer(
        lambda s: 0.1, params=params, frozen_stages=1, grad_clip_norm=None
    )
    state = create_train_state({"params": params}, tx)
    grads = jax.tree.map(jnp.ones_like, params)
    new = state.apply_gradients(grads)
    np.testing.assert_array_equal(
        np.asarray(new.params["backbone"]["conv1"]["kernel"]), 1.0
    )
    assert (
        np.asarray(new.params["backbone"]["layer2_0"]["conv1"]["kernel"]) < 1.0
    ).all()


def test_grad_clip():
    params = {"w": jnp.ones(3)}
    tx = make_optimizer(lambda s: 1.0, momentum=0.0, weight_decay=0.0,
                        grad_clip_norm=1.0)
    state = create_train_state({"params": params}, tx)
    big = {"w": jnp.full(3, 100.0)}
    new = state.apply_gradients(big)
    delta = np.asarray(params["w"] - new.params["w"])
    np.testing.assert_allclose(np.linalg.norm(delta), 1.0, rtol=1e-5)


def test_checkpoint_round_trip(tmp_path):
    from boosting_rcnn_tpu.engine.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.arange(4, dtype=jnp.float32), "b": jnp.ones(2)}
    tx = make_optimizer(lambda s: 0.1)
    state = create_train_state({"params": params}, tx)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, meta={"epoch": 3})

    fresh = create_train_state(
        {"params": jax.tree.map(jnp.zeros_like, params)}, tx
    )
    restored, meta = restore_checkpoint(path, fresh)
    assert meta["epoch"] == 3
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), [0, 1, 2, 3])


def test_ema():
    from boosting_rcnn_tpu.engine.hooks import ema_init, ema_update

    p0 = {"w": jnp.zeros(3)}
    ema = ema_init(p0)
    p1 = {"w": jnp.ones(3)}
    for _ in range(10):
        ema = ema_update(ema, p1, momentum=0.1)
    v = float(ema["w"][0])
    assert 0.6 < v < 0.7  # 1 - 0.9^10


def test_adamw_option():
    params = {"w": jnp.ones(3)}
    tx = make_optimizer(lambda s: 0.01, opt_type="adamw")
    state = create_train_state({"params": params}, tx)
    new = state.apply_gradients({"w": jnp.ones(3)})
    assert not np.allclose(np.asarray(new.params["w"]), 1.0)


@pytest.mark.slow
def test_live_bn_updates_running_stats():
    """SyncBN surface (VERDICT r1 item 4): a YOLOX train step must update
    BatchNorm running statistics (reference trains YOLOX from scratch with
    live BN), and inference must then consume the updated stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        make_optimizer,
        make_train_step,
        step_lr_schedule,
    )
    import os

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "configs/yolox/yolox_s_8x8_300e_coco.py")
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(deepen_factor=0.1, widen_factor=0.125)
    mc["neck"]["out_channels"] = 16
    mc["bbox_head"].update(feat_channels=16, num_classes=4)
    det = build_detector(mc)
    canvas = (64, 64)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    assert variables.get("batch_stats"), "YOLOX must carry live BN stats"
    pack, nlp = det.anchors_for(canvas)

    tx = make_optimizer(step_lr_schedule(0.01, 10), params=variables["params"])
    state = create_train_state(variables, tx)
    step = make_train_step(det, pack, nlp)

    loader = FakeDetLoader(batch_size=2, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    old_stats = jax.tree_util.tree_leaves(state.batch_stats)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    new_stats = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert len(old_stats) == len(new_stats)
    moved = sum(
        float(jnp.abs(a - b).sum()) for a, b in zip(old_stats, new_stats)
    )
    assert moved > 0, "running statistics did not update"
    # structure stable across steps (jit cache reuse)
    s2, _ = jax.jit(step)(new_state, batch, jax.random.PRNGKey(2))
    assert jax.tree_util.tree_structure(
        s2.batch_stats
    ) == jax.tree_util.tree_structure(state.batch_stats)

    # inference consumes the updated stats without mutation
    dets, labels, valid = det.predict(
        {"params": s2.params, "batch_stats": s2.batch_stats},
        batch, pack, nlp,
    )
    assert np.isfinite(np.asarray(dets)[np.asarray(valid)]).all()


@pytest.mark.slow
def test_frozen_bn_models_keep_stats_constant():
    """Boosting R-CNN (norm_eval=True) must NOT change batch_stats through
    the live-BN-capable train step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import os

    from boosting_rcnn_tpu.builder import build_detector
    from boosting_rcnn_tpu.config import load_config
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        make_optimizer,
        make_train_step,
        step_lr_schedule,
    )

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(
            REPO, "configs/boosting_rcnn/boosting_rcnn_r50_pafpn_1x_utdac.py"
        )
    )
    mc = cfg.model.to_dict()
    mc["backbone"].update(depth=18, base_channels=8)
    mc["neck"].update(in_channels=[8, 16, 32, 64], out_channels=32)
    mc["rpn_head"].update(feat_channels=32, stacked_convs=1)
    mc["roi_head"]["bbox_head"]["fc_out_channels"] = 16
    mc["train_cfg"]["rpn_proposal"].update(nms_pre=32, max_per_img=16)
    mc["train_cfg"]["rcnn"]["sampler"]["num"] = 8
    det = build_detector(mc)
    canvas = (64, 64)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    tx = make_optimizer(step_lr_schedule(0.01, 10), params=variables["params"])
    state = create_train_state(variables, tx)
    step = make_train_step(det, anchors, nla)
    loader = FakeDetLoader(batch_size=1, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
