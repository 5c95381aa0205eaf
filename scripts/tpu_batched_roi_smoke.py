"""TPU smoke + micro-bench for the batched (whole-batch, single-call)
Pallas RoIAlign vs the per-image vmapped variants at flagship train
geometry (bs8, 800x1344, C=256 bf16, strides 8..128).

Numerics: batched forward/backward vs the vmapped XLA fast path.
Timing: K-delta chained iterations (relay-safe — one block at the end).

Usage: python scripts/tpu_batched_roi_smoke.py [--timing] [--r N]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from boosting_rcnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

B = 8
C = 256
STRIDES = (8, 16, 32, 64, 128)
SHAPES = [(100, 168), (50, 84), (25, 42), (13, 21), (7, 11)]
DT = jnp.bfloat16


def make_case(r):
    rs = np.random.RandomState(0)
    feats = tuple(
        jnp.asarray(rs.randn(B, h, w, C), DT) for h, w in SHAPES
    )
    cx = rs.uniform(20, 1320, (B, r))
    cy = rs.uniform(20, 780, (B, r))
    bw = rs.uniform(8, 700, (B, r))
    bh = rs.uniform(8, 500, (B, r))
    rois = jnp.asarray(
        np.stack([
            np.clip(cx - bw / 2, 0, None), np.clip(cy - bh / 2, 0, None),
            np.clip(cx + bw / 2, None, 1343.0),
            np.clip(cy + bh / 2, None, 799.0),
        ], -1), jnp.float32)
    valid = jnp.ones((B, r), bool)
    g = jnp.asarray(rs.randn(B, r, 7, 7, C), jnp.float32)
    return feats, rois, valid, g


def main():
    import boosting_rcnn_tpu.ops.pallas_roi_align as pra
    from boosting_rcnn_tpu.ops.roi_align import multilevel_roi_align_fast

    r = 512
    out_size = 7
    for a in sys.argv[1:]:
        if a.startswith("--r"):
            r = int(sys.argv[sys.argv.index(a) + 1])
    if "--mask" in sys.argv:  # mask-branch geometry (14x14, fewer rois)
        r, out_size = 128, 14
    feats, rois, valid, g = make_case(r)
    if out_size != 7:
        rs = np.random.RandomState(1)
        g = jnp.asarray(rs.randn(B, r, out_size, out_size, C), jnp.float32)
    print(f"backend={jax.default_backend()} B={B} R={r} C={C} "
          f"out={out_size} dt={DT}")

    kw = dict(out_size=out_size, sample_num=2, finest_scale=56,
              num_route_levels=5)

    def loss_batched(fs):
        out = pra.batched_multilevel_roi_align(
            fs, rois, valid, STRIDES, **kw)
        return jnp.sum(out.astype(jnp.float32) * g)

    def loss_xla(fs):
        out = jax.vmap(
            lambda fl, rb, vb: multilevel_roi_align_fast(
                fl, rb, vb, STRIDES, **kw)
        )(fs, rois, valid)
        return jnp.sum(out.astype(jnp.float32) * g)

    def loss_perimg(fs):
        out = jax.vmap(
            lambda fl, rb, vb: pra.multilevel_roi_align_pallas_trainable(
                fl, rb, vb, STRIDES, **kw)
        )(fs, rois, valid)
        return jnp.sum(out.astype(jnp.float32) * g)

    t0 = time.time()
    vb, gb = jax.jit(jax.value_and_grad(loss_batched))(feats)
    jax.block_until_ready(gb)
    print(f"batched fwd+bwd compiled+ran in {time.time() - t0:.1f}s")
    t0 = time.time()
    vx, gx = jax.jit(jax.value_and_grad(loss_xla))(feats)
    jax.block_until_ready(gx)
    print(f"xla fwd+bwd compiled+ran in {time.time() - t0:.1f}s")

    print(f"loss batched={float(vb):.4f} xla={float(vx):.4f}")
    for i, (a, e) in enumerate(zip(gb, gx)):
        a = np.asarray(a, np.float32)
        e = np.asarray(e, np.float32)
        err = np.abs(a - e).max()
        den = np.abs(e).max() + 1e-6
        print(f"  lvl{i} grad maxabs={np.abs(e).max():.4f} maxerr={err:.5f} "
              f"rel={err / den:.5f}")

    if "--timing" not in sys.argv:
        return

    def chain(lossfn, fs, k):
        def step(f0):
            v, gr = jax.value_and_grad(lossfn)(f0)
            # feed the gradient back so iterations chain (no host sync)
            return tuple(
                (x + 0.0 * gg.astype(x.dtype)) for x, gg in zip(f0, gr)), v

        f = fs
        vals = []
        jitted = jax.jit(step)
        f, v = jitted(f)  # compile
        jax.block_until_ready(v)
        t0 = time.time()
        for _ in range(k):
            f, v = jitted(f)
            vals.append(v)
        jax.block_until_ready(vals)
        return (time.time() - t0) / k

    k = 30
    for name, fn in (("batched", loss_batched), ("perimg", loss_perimg),
                     ("xla", loss_xla)):
        dt = chain(fn, feats, k)
        print(f"{name:8s} fwd+bwd chained: {dt * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
