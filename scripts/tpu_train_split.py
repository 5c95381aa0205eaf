"""Round-3 train-step split experiment (VERDICT r2 item 1).

Measures, on the real TPU at the bench geometry (flagship Boosting R-CNN
R50-PAFPN, bs8, 800x1344, bf16), the steady-state chained throughput of:

  v0_fused        proposals inside the grad program (round-2 baseline)
  v1_outside_grad single dispatch, proposals+sampling before value_and_grad
                  (duplicate backbone+RPN fwd, NMS outside grad; exact)
  v2_external     two dispatches: sample program + grad program (exact)
  v3_stale        single dispatch, proposals for step N+1 computed from step
                  N's detached RPN outputs after the grad region (no
                  duplicate fwd, NMS outside grad; 1-step-stale semantics)

All variants share the chained measurement from bench.py: N steps
serialized by the state dependency, one final sync.

Run with the TPU attached; keep it the only TPU process.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np

from __graft_entry__ import _build

BATCH = int(os.environ.get("PROF_BATCH", "8"))
CANVAS = (800, 1344)
N_STEPS = int(os.environ.get("PROF_STEPS", "30"))
WARMUP = 4
ONLY = os.environ.get("PROF_ONLY", "").split(",") if os.environ.get("PROF_ONLY") else None


def main():
    from boosting_rcnn_tpu.data.loader import FakeDetLoader
    from boosting_rcnn_tpu.engine.train import (
        create_train_state,
        make_optimizer,
        make_sample_step,
        make_train_step,
        step_lr_schedule,
    )
    from boosting_rcnn_tpu.utils.transfer import chunked_device_put

    det = _build(tiny=False)
    variables = det.init(jax.random.PRNGKey(0), CANVAS)
    anchors, nla = det.anchors_for(CANVAS)
    tx = make_optimizer(
        step_lr_schedule(0.005, 1000), grad_clip_norm=35.0,
        params=variables["params"], frozen_stages=1,
    )
    state = create_train_state(variables, tx)
    loader = FakeDetLoader(
        batch_size=BATCH, canvas=CANVAS, num_classes=4, num_batches=1)
    tb = next(loader.epoch_iter(0))
    tb.pop("ori_shape")
    tb = {k: chunked_device_put(v) for k, v in tb.items()}
    rng = jax.random.PRNGKey(0)

    results = {}

    def measure(name, run_one, st0, extra0=None):
        if ONLY and name not in ONLY:
            return
        t_c = time.perf_counter()
        out = run_one(st0, extra0)
        jax.block_until_ready(out[0])
        print(f"[{name}] compiled+first step in "
              f"{time.perf_counter() - t_c:.1f}s", flush=True)
        st, ex = out
        for _ in range(WARMUP - 1):
            st, ex = run_one(st, ex)
        jax.block_until_ready(st)
        t0 = time.perf_counter()
        for _ in range(N_STEPS):
            st, ex = run_one(st, ex)
        jax.block_until_ready(st)
        dt = (time.perf_counter() - t0) / N_STEPS
        results[name] = {
            "ms_per_step": round(dt * 1000, 1),
            "img_per_s": round(BATCH / dt, 2),
        }
        print(json.dumps({name: results[name]}), flush=True)

    # v0: fused (round-2 baseline)
    step0 = jax.jit(make_train_step(det, anchors, nla))
    measure("v0_fused", lambda st, _: (step0(st, tb, rng)[0], None), state)

    # v1: outside_grad, single dispatch
    step1 = jax.jit(
        make_train_step(det, anchors, nla, proposal_mode="outside_grad"))
    measure("v1_outside_grad",
            lambda st, _: (step1(st, tb, rng)[0], None), state)

    # v2: external, two dispatches
    samp = jax.jit(make_sample_step(det, anchors, nla))
    step2 = jax.jit(
        make_train_step(det, anchors, nla, proposal_mode="external"))
    measure("v2_external",
            lambda st, _: (step2(st, tb, rng, samp(st, tb, rng))[0], None),
            state)

    # v3: stale, single dispatch carrying the sample
    step3 = jax.jit(make_train_step(det, anchors, nla, proposal_mode="stale"))
    if ONLY is None or "v3_stale" in ONLY:
        sample0 = samp(state, tb, rng)
        jax.block_until_ready(sample0)

        def run3(st, sm):
            st2, _, sm2 = step3(st, tb, rng, sm)
            return st2, sm2

        measure("v3_stale", run3, state, sample0)

    print("FINAL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
