"""Persistent XLA compilation cache (utils/compile_cache.py)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flairtpu.utils.compile_cache import enable_compile_cache


@pytest.fixture
def _restore_cache_config():
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    yield
    jax.config.update("jax_compilation_cache_dir", old_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", old_min)


def test_cache_populates_and_hits(tmp_path, _restore_cache_config):
    cache = tmp_path / "xla"
    assert enable_compile_cache(cache) == str(cache)
    # CPU compiles of small programs finish under JAX's default 1 s
    # write-threshold; drop it so this test exercises the write path
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    @jax.jit
    def f(x):
        return jnp.sin(x) @ x.T

    np.testing.assert_allclose(
        np.asarray(f(jnp.ones((64, 64)))), np.sin(1.0) * 64, rtol=1e-5)
    entries = list(cache.rglob("*"))
    assert any(p.is_file() for p in entries), "no cache entry written"


def test_opt_out_env(tmp_path, monkeypatch, _restore_cache_config):
    monkeypatch.setenv("FLAIRTPU_NO_COMPILE_CACHE", "1")
    assert enable_compile_cache(tmp_path / "nope") is None
    assert not (tmp_path / "nope").exists()


def test_env_override_and_unwritable(tmp_path, monkeypatch, _restore_cache_config):
    target = tmp_path / "from_env"
    monkeypatch.setenv("FLAIRTPU_COMPILE_CACHE", str(target))
    assert enable_compile_cache() == str(target)
    assert target.is_dir()
    # unwritable location -> disabled, not crashed
    if os.geteuid() != 0:  # root can write anywhere; skip the negative half
        ro = tmp_path / "ro"
        ro.mkdir()
        ro.chmod(0o400)
        monkeypatch.delenv("FLAIRTPU_COMPILE_CACHE")
        assert enable_compile_cache(ro / "sub") is None
