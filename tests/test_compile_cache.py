"""Persistent-compile-cache helper (utils/cache.py).

Regression: the CPU-mesh dryrun disables the cache by setting
``JAX_COMPILATION_CACHE_DIR=""`` (XLA:CPU AOT entries are host-specific);
``enable_compilation_cache`` must treat the empty override as "disabled"
instead of calling ``os.makedirs("")`` (round-5 driver-contract bug:
``dryrun_multichip``'s re-exec subprocess died at import time).
"""
import os

import pytest

from boosting_rcnn_tpu.utils import cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    import jax

    prev = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", prev)


def test_empty_env_means_disabled(monkeypatch, tmp_path):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "")
    cache.enable_compilation_cache(str(tmp_path / "never"))
    assert not (tmp_path / "never").exists()


def test_env_override_wins(monkeypatch, tmp_path):
    override = tmp_path / "override"
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(override))
    cache.enable_compilation_cache(str(tmp_path / "default"))
    assert override.exists()
    assert not (tmp_path / "default").exists()


def test_default_dir_created(monkeypatch, tmp_path):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    d = tmp_path / "cache"
    cache.enable_compilation_cache(str(d))
    assert d.exists()
    # the helper exports the path so child processes inherit it
    assert os.environ["JAX_COMPILATION_CACHE_DIR"] == str(d)
