"""Multi-device data-parallel tests on the virtual 8-device CPU mesh
(SURVEY.md §4's recommended strategy for testing what the reference never
could: real sharded execution)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_rcnn_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)


def test_mesh_has_8_devices():
    assert jax.device_count() >= 8, "conftest must force 8 virtual devices"
    mesh = create_mesh(8)
    assert mesh.devices.size == 8


def test_sharded_sum_matches_single_device():
    mesh = create_mesh(8)
    x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh))
    f = jax.jit(lambda a: jnp.sum(a), out_shardings=replicated(mesh))
    assert float(f(xs)) == float(x.sum())


@pytest.mark.slow
def test_dp_train_step_matches_single_device():
    """The sharded train step must produce the same loss/grads as the
    unsharded one (global-batch semantics)."""
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        step_lr_schedule,
    )
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scripts.smoke_e2e import build_tiny

    det = build_tiny()
    canvas = (128, 160)
    variables = det.init(jax.random.PRNGKey(0), canvas)
    anchors, nla = det.anchors_for(canvas)
    tx = make_optimizer(step_lr_schedule(0.01, 10), params=variables["params"],
                        frozen_stages=1)
    state = create_train_state(variables, tx)
    step = make_train_step(det, anchors, nla)

    loader = FakeDetLoader(batch_size=8, canvas=canvas, num_classes=4,
                           num_batches=1)
    batch = next(loader.epoch_iter(0))
    batch.pop("ori_shape")
    rng = jax.random.PRNGKey(3)

    # single device
    s1, m1 = jax.jit(step)(state, {k: jnp.asarray(v) for k, v in batch.items()}, rng)

    # 8-device mesh
    mesh = create_mesh(8)
    rep = replicated(mesh)
    sharded = jax.jit(
        step, in_shardings=(rep, batch_sharding(mesh), rep),
        out_shardings=(rep, rep),
    )
    s2, m2 = sharded(
        jax.device_put(state, rep), shard_batch(mesh, batch),
        jax.device_put(rng, rep),
    )
    for k in m1:
        # grad_norm sums thousands of squared grads — the most reduction-
        # order-sensitive scalar; sharding changes f32 summation order
        rtol = 1e-3 if k == "grad_norm" else 2e-4
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=rtol, atol=1e-5
        ), k
    # params identical after the step
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params
    )
    assert max(jax.tree.leaves(d)) < 1e-5


def test_cluster_spec_from_env():
    """Forged-env coverage of the Slurm/explicit launcher parsing
    (tools/slurm_train.sh relies on this; reference analog is
    mmcv dist_utils' _init_dist_slurm SLURM_* -> MASTER_ADDR mapping)."""
    from boosting_rcnn_tpu.parallel.mesh import cluster_spec_from_env

    # explicit coordinator wins
    assert cluster_spec_from_env(
        {"COORDINATOR_ADDRESS": "10.0.0.1:1234",
         "NUM_PROCESSES": "4", "PROCESS_ID": "2",
         "SLURM_NTASKS": "8", "SLURM_JOB_NODELIST": "other"}
    ) == ("10.0.0.1:1234", 4, 2)
    assert cluster_spec_from_env(
        {"COORDINATOR_ADDRESS": "10.0.0.1:1234"}
    ) == ("10.0.0.1:1234", None, None)

    # srun task env: bracket hostlist, zero padding preserved
    spec = cluster_spec_from_env({
        "SLURM_STEP_NODELIST": "tpu-host[003-006]",
        "SLURM_NTASKS": "4", "SLURM_PROCID": "3",
        "SLURM_JOB_ID": "12345",
    })
    assert spec == (f"tpu-host003:{8476 + 12345 % 1024}", 4, 3)

    # comma list + explicit port override; JOB_NODELIST fallback
    assert cluster_spec_from_env({
        "SLURM_JOB_NODELIST": "alpha,beta",
        "SLURM_NTASKS": "2", "SLURM_PROCID": "1",
        "COORDINATOR_PORT": "9999",
    }) == ("alpha:9999", 2, 1)

    # bracket with inner comma before another host
    assert cluster_spec_from_env({
        "SLURM_STEP_NODELIST": "n[1,7],m2",
        "SLURM_NTASKS": "3", "SLURM_PROCID": "0",
        "SLURM_JOB_ID": "7",
    })[0].startswith("n1:")

    # single host / single task -> no distributed init
    assert cluster_spec_from_env({}) is None
    assert cluster_spec_from_env(
        {"SLURM_JOB_NODELIST": "solo", "SLURM_NTASKS": "1"}) is None
