"""Persistent XLA compilation cache for the hosted (axon) TPU backend.

Probed 2026-08-20 (tools/probe_compile_cache.py,
save/bench/probe_compile_cache.json): `jax_compilation_cache_dir`
round-trips compiled executables through the axon plugin — a warm process
loads a cached Pallas program in ~0.6 s instead of re-invoking the remote
compile helper (~3.5 s for a tiny kernel, ~100-300 s for the fused
flagship program). Since the helper is the component that degrades
(SIGKILLs big Mosaic programs for hours at a time, CLAUDE.md), a cache
populated during ONE healthy compile makes bench/eval immune to
compile-host degradation from then on.

Call `enable_compile_cache()` BEFORE the first jit dispatch. Opt out with
FLOWCOMPARE_NO_COMPILE_CACHE=1; redirect with FLOWCOMPARE_COMPILE_CACHE.
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# editable/source checkout -> repo-local cache (shared by bench + tools);
# site-packages install -> per-user cache
DEFAULT_DIR = (os.path.join(_REPO_ROOT, "save", "jax_cache")
               if os.path.isfile(os.path.join(_REPO_ROOT, "pyproject.toml"))
               else os.path.join(os.path.expanduser("~"), ".cache",
                                 "flowcompare_tpu", "jax_cache"))


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a repo-local dir.

    Returns the directory in use, or None when disabled/unavailable.
    Safe to call more than once; must run before the first compilation to
    be effective for it."""
    if os.environ.get("FLOWCOMPARE_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = (cache_dir or os.environ.get("FLOWCOMPARE_COMPILE_CACHE")
                 or DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program (the default 1 s floor would skip small
        # helper jits whose ~25 ms-per-dispatch recompiles still add up
        # through the tunnel)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None
    return cache_dir
