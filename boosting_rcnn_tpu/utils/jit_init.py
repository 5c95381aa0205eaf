"""Single-program parameter initialization for remote-TPU entry points.

``detector.init`` (flax ``Module.init``) runs the init forward *eagerly*:
through the axon relay that is hundreds of per-op dispatches plus dozens
of tiny per-initializer jit compiles — measured at >6 minutes wall for
the full-size flagship, and the reason the round-4 driver bench timed
out before ever reaching the first measurement.  Tracing the whole init
into ONE jitted program turns it into a single compile, which the
persistent compilation cache (``utils/cache.py``) then serves across
processes and rounds.

CPU tests keep calling ``detector.init`` directly — for tiny models the
eager path is faster than paying a per-config XLA compile in the
197-config smoke suite.  Use this helper only where the default backend
is a (remote) TPU: ``bench.py``, ``__graft_entry__.py``, the train CLI.
"""
from __future__ import annotations


def jitted_init(det, rng, canvas_hw, batch_size: int = 1):
    """``det.init`` traced as one jit program (same result, one compile)."""
    import jax

    fn = jax.jit(
        lambda r: det.init(r, canvas_hw, batch_size=batch_size),
    )
    return fn(rng)
