"""enable_compile_cache: opt-out, redirect, and harmless double-call."""

import os

import jax
import pytest

from flowcompare_tpu.compile_cache import enable_compile_cache


@pytest.fixture(autouse=True)
def _restore_jax_cache_config():
    """All three cache config keys are global; restore them even when an
    assertion fails mid-test (tmp_path dies with the test, and later
    compiles must not try writing into it)."""
    keys = ("jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes")
    prev = {k: getattr(jax.config, k) for k in keys}
    yield
    for k, v in prev.items():
        jax.config.update(k, v)


def test_enable_compile_cache_redirect_and_optout(tmp_path, monkeypatch):
    target = str(tmp_path / "cache")
    monkeypatch.setenv("FLOWCOMPARE_COMPILE_CACHE", target)
    got = enable_compile_cache()
    assert got == target and os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    # idempotent
    assert enable_compile_cache() == target

    monkeypatch.setenv("FLOWCOMPARE_NO_COMPILE_CACHE", "1")
    assert enable_compile_cache() is None

    # explicit argument wins over the default
    monkeypatch.delenv("FLOWCOMPARE_NO_COMPILE_CACHE")
    monkeypatch.delenv("FLOWCOMPARE_COMPILE_CACHE")
    other = str(tmp_path / "cache2")
    assert enable_compile_cache(other) == other
