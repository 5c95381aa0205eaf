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
