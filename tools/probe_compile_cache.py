"""Probe: does the JAX persistent compilation cache work through axon?

VERDICT r3 item 2: the flagship headline is hostage to compile-host
health — every program containing the encoder kNN kernel is SIGKILLed on
a degraded host. If `jax_compilation_cache_dir` round-trips executables
through the axon plugin, a healthy-host compile becomes reusable across
sessions and the stale-fallback path mostly disappears.

Method: two fresh subprocesses share a fresh cache dir. Each compiles the
same two programs — a pure-XLA matmul chain and a small Pallas kernel
(small enough to survive a degraded compile helper; the degradation only
kills the big encoder kNN programs). If the second process's compiles are
near-instant AND the cache dir contains entries, the cache works; if the
dir stays empty or timings match, it is a no-op through the tunnel.

Writes save/bench/probe_compile_cache.json. Exit 0 either way (the
artifact records the verdict).
"""

import json
import os
import shutil
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "save", "bench", "probe_compile_cache.json")
CACHE_DIR = "/tmp/jax_axon_cache_probe"

_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_compilation_cache_dir", sys.argv[1])
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl

salt = int(sys.argv[2])

def timed_xla():
    @jax.jit
    def f(x):
        for _ in range(6):
            x = jnp.tanh(x @ x) + salt * 1e-9   # salt keeps HLO identical
        return x
    x = jnp.ones((256, 256), jnp.bfloat16)
    t0 = time.time()
    float(f(x)[0, 0].astype(jnp.float32))
    return time.time() - t0

def timed_pallas():
    def kern(x_ref, o_ref):
        o_ref[...] = jnp.maximum(x_ref[...], 0.0) * 2.0 + salt * 1e-9

    @jax.jit
    def g(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
        )(x)
    x = jnp.ones((256, 256), jnp.float32)
    t0 = time.time()
    float(g(x)[0, 0])
    return time.time() - t0

res = {"t_xla": round(timed_xla(), 3), "t_pallas": round(timed_pallas(), 3)}
print("CHILD_JSON " + json.dumps(res))
"""


def _run_child(tag: str) -> dict:
    p = subprocess.run([sys.executable, "-c", _CHILD, CACHE_DIR, "0"],
                       capture_output=True, text=True, timeout=600)
    lines = [l for l in p.stdout.splitlines() if l.startswith("CHILD_JSON ")]
    if p.returncode != 0 or not lines:
        return {"error": f"{tag} rc={p.returncode}",
                "stderr": p.stderr[-800:]}
    return json.loads(lines[-1][len("CHILD_JSON "):])


def _cache_listing() -> list:
    if not os.path.isdir(CACHE_DIR):
        return []
    out = []
    for dirpath, _, files in os.walk(CACHE_DIR):
        for fn in files:
            fp = os.path.join(dirpath, fn)
            out.append({"file": os.path.relpath(fp, CACHE_DIR),
                        "bytes": os.path.getsize(fp)})
    return out


def main():
    shutil.rmtree(CACHE_DIR, ignore_errors=True)
    os.makedirs(CACHE_DIR, exist_ok=True)
    cold = _run_child("cold")
    listing_after_cold = _cache_listing()
    warm = _run_child("warm")
    listing = _cache_listing()

    works = bool(listing_after_cold) and "error" not in warm and (
        warm.get("t_xla", 1e9) < 0.5 * max(cold.get("t_xla", 0.0), 0.2)
        or warm.get("t_pallas", 1e9) < 0.5 * max(cold.get("t_pallas", 0.0),
                                                 0.2))
    artifact = {
        "probe": "jax persistent compilation cache through axon",
        "cold": cold,
        "warm": warm,
        "cache_entries_after_cold": len(listing_after_cold),
        "cache_entries": listing[:20],
        "cache_works": works,
        "recorded": time.strftime("%Y-%m-%d %H:%M"),
        "note": ("cache round-trips executables — a healthy-host compile is "
                 "reusable on a degraded host via the same cache dir"
                 if works else
                 "cache is a no-op (or compiles failed) through the axon "
                 "plugin — degraded-host mitigation must shrink the program "
                 "instead"),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
