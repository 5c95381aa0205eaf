"""Persistent XLA compilation cache setup.

The first compile of the full detector takes minutes (remote-compiled
through the axon relay); enabling jax's persistent cache makes every
subsequent process reuse the serialized executable.

The cache lives INSIDE the repo (``<repo>/.jax_cache``) and its entries
are committed to git on purpose: the container — including
``/root/.jax_cache`` — is recreated between build rounds, and the
driver's end-of-round ``bench.py`` run lands on a cold machine.  A cold
full-model compile (~10 min per program through the remote compiler)
exceeds the driver's bench timeout (round 4's bench died at rc 124 with
zero output for exactly this reason); the git-persisted cache is the
only storage that survives, and with it the bench starts warm.  Entries
are keyed by HLO + jaxlib version + device kind, all of which are fixed
by the container image, so cross-round reuse is sound.
"""
import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, ".jax_cache")


def enable_compilation_cache(path: str = DEFAULT_CACHE_DIR) -> None:
    # explicit env var wins (lets CI/driver point elsewhere); an EMPTY
    # value means "explicitly disabled" — the CPU-mesh dryrun sets
    # JAX_COMPILATION_CACHE_DIR="" because XLA:CPU AOT entries bake in
    # host machine features (loading one compiled elsewhere SIGILLs)
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR", path)
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
