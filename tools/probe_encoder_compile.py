"""Compile-health canary for the one-launch encoder megakernel.

The DGCNN one-launch kernel is the program the degraded compile host kills
(tools/probe_compile_health2.py, 2026-08-20). This probe jits ONLY that
kernel on one batch item — the cheapest question that predicts whether the
full fused bench program will compile. Exit 0 = healthy.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

from flowcompare_tpu.compile_cache import enable_compile_cache

CACHE_DIR = enable_compile_cache()   # a healthy compile here immunises later runs

import jax.numpy as jnp


def _cache_entries() -> set:
    try:
        return set(os.listdir(CACHE_DIR)) if CACHE_DIR else set()
    except OSError:
        return set()


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders.dgcnn import init_dgcnn, apply_dgcnn

    cfg = fc.get_config("dulcet-universe")
    key = jax.random.fold_in(jax.random.PRNGKey(3),
                             int(time.time() * 1e3) % (2 ** 31))
    params, state = init_dgcnn(
        jax.random.PRNGKey(0), input_dim=6,
        emb_dim=cfg["input_embedding_dim"],
        out_mlp_dims=cfg["hidden_dims_embedder_out"])
    x = jax.random.normal(key, (1, cfg["n_samples_context"], 6))

    @jax.jit
    def enc(params, state, x):
        out, _ = apply_dgcnn(params, state, x, training=False,
                             dtype=jnp.bfloat16, fused=True)
        return out

    before = _cache_entries()
    t0 = time.time()
    out = enc(params, state, x)
    dt = time.time() - t0
    # Distinguish a true fresh compile from a persistent-cache load: a
    # cache-hit writes no new entries and loads in ~1 s, while a fresh
    # encoder compile goes through the remote helper (the component that
    # degrades). The watcher keys on this token — ENCODER_HEALTHY must
    # mean the helper itself is healthy, not that the cache is warm
    # (ADVICE r4: a cache-hit 'healthy' can stall headline_runs on
    # programs not yet cached).
    wrote_new = bool(_cache_entries() - before)
    path = ("fresh-compile" if (CACHE_DIR is None or wrote_new or dt > 15.0)
            else "cache-hit")
    print(f"encoder one-launch compiled+ran in {dt:.1f}s, "
          f"out {out.shape} finite={bool(jnp.isfinite(out).all())} "
          f"path={path}")


if __name__ == "__main__":
    main()
