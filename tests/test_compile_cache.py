"""enable_compile_cache: opt-out, redirect, and harmless double-call."""

import os

import jax

from flowcompare_tpu.compile_cache import enable_compile_cache


def test_enable_compile_cache_redirect_and_optout(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir
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
    # leave global jax config as we found it (tmp_path dies with the test)
    jax.config.update("jax_compilation_cache_dir", prev)
