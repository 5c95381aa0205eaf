"""Proposal-split train-step variants (docs/TRAIN_PERF.md round-3
experiment): outside_grad / external must be numerically identical to the
fused reference step; stale must run and produce finite losses + a
next-step RoISample.

Reference semantics being preserved: proposals are generated inside
``forward_train`` from the current step's RPN outputs and detached
(``mmdet/models/detectors/two_stage.py:127-151``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.engine.train import (
    create_train_state,
    make_optimizer,
    make_sample_step,
    make_train_step,
    step_lr_schedule,
)


@pytest.fixture(scope="module")
def setup():
    import __graft_entry__ as ge

    det = ge._build(tiny=True)
    canvas = (96, 128)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    tx = make_optimizer(step_lr_schedule(0.005, 100), params=variables["params"])
    state = create_train_state(variables, tx)
    rs = np.random.RandomState(0)
    b, g = 2, 5
    batch = {
        "images": jnp.asarray(rs.rand(b, *canvas, 3), jnp.float32),
        "gt_bboxes": jnp.asarray(
            np.stack(
                [
                    np.stack(
                        [
                            np.array([x, y, x + w, y + h], np.float32)
                            for x, y, w, h in zip(
                                rs.uniform(0, 60, g),
                                rs.uniform(0, 40, g),
                                rs.uniform(8, 40, g),
                                rs.uniform(8, 40, g),
                            )
                        ]
                    )
                    for _ in range(b)
                ]
            )
        ),
        "gt_labels": jnp.asarray(rs.randint(0, 4, (b, g)), jnp.int32),
        "gt_mask": jnp.ones((b, g), bool),
        "img_shape": jnp.asarray([[96.0, 128.0]] * b, jnp.float32),
    }
    return det, state, batch, anchors, nla


def _tree_allclose(a, b, atol=1e-5):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x, np.float32), np.asarray(y, np.float32), atol=atol
        )


@pytest.mark.slow
def test_outside_grad_matches_fused(setup):
    det, state, batch, anchors, nla = setup
    rng = jax.random.PRNGKey(7)
    s0, m0 = jax.jit(make_train_step(det, anchors, nla))(state, batch, rng)
    s1, m1 = jax.jit(
        make_train_step(det, anchors, nla, proposal_mode="outside_grad")
    )(state, batch, rng)
    _tree_allclose(m0, m1)
    _tree_allclose(s0.params, s1.params)


@pytest.mark.slow
def test_external_matches_fused(setup):
    det, state, batch, anchors, nla = setup
    rng = jax.random.PRNGKey(7)
    s0, m0 = jax.jit(make_train_step(det, anchors, nla))(state, batch, rng)
    sample = jax.jit(make_sample_step(det, anchors, nla))(state, batch, rng)
    s2, m2 = jax.jit(
        make_train_step(det, anchors, nla, proposal_mode="external")
    )(state, batch, rng, sample)
    _tree_allclose(m0, m2)
    _tree_allclose(s0.params, s2.params)


@pytest.mark.slow
def test_stale_runs_and_chains(setup):
    det, state, batch, anchors, nla = setup
    rng = jax.random.PRNGKey(7)
    sample = jax.jit(make_sample_step(det, anchors, nla))(state, batch, rng)
    step = jax.jit(make_train_step(det, anchors, nla, proposal_mode="stale"))
    st, sm = state, sample
    for _ in range(2):
        st, m, sm = step(st, batch, rng, sm)
        assert np.isfinite(float(m["loss"]))
    # next-sample has the RoISample structure with same leading dims
    assert sm.boxes.shape == sample.boxes.shape


@pytest.mark.slow
def test_multi_step_scan_matches_sequential(setup):
    """One lax.scan dispatch of S steps == S sequential fused steps
    (engine.train.make_multi_step_train; the per-step fold_in on
    ``state.step`` advances through the scan carry)."""
    from boosting_rcnn_tpu.engine.train import make_multi_step_train

    det, state, batch, anchors, nla = setup
    rng = jax.random.PRNGKey(7)
    S = 3
    step = jax.jit(make_train_step(det, anchors, nla))
    s_seq, seq_metrics = state, []
    for _ in range(S):
        s_seq, m = step(s_seq, batch, rng)
        seq_metrics.append(m)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * S), batch)
    s_scan, m_scan = jax.jit(make_multi_step_train(det, anchors, nla))(
        state, stacked, rng)
    _tree_allclose(s_seq.params, s_scan.params, atol=1e-4)
    assert int(s_scan.step) == int(s_seq.step)
    for i in range(S):
        np.testing.assert_allclose(
            float(seq_metrics[i]["loss"]), float(m_scan["loss"][i]),
            atol=1e-3, rtol=1e-4)
