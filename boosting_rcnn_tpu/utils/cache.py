"""Persistent XLA compilation cache setup.

The first compile of the full detector takes minutes (remote-compiled
through the axon relay); enabling jax's persistent cache makes every
subsequent process reuse the serialized executable.
"""
import os


def enable_compilation_cache(path: str = "/root/.jax_cache") -> None:
    os.makedirs(path, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
