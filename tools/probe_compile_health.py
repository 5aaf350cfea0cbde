"""Probe which eval programs the (possibly degraded) compile host accepts.

The remote tpu_compile_helper can be SIGKILLed on large programs while tiny
ones compile fine (observed 2026-08-20: the ~1MB-MLIR fused-eval program
failed at every CHUNK while an 8x8 matmul compiled). This probe compiles,
in order of increasing size, (a) a tiny matmul, (b) the pure-XLA scan-path
eval (no Pallas kernels), (c) the fused eval at CHUNK=1, writing one status
line per stage so a watcher can see exactly where the host gives up.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import flowcompare_tpu as fc

    salt = int(time.time() * 1e3) % (2 ** 31)
    key = jax.random.fold_in(jax.random.PRNGKey(7), salt)

    t0 = time.time()
    x = jax.random.normal(key, (128, 128))
    v = float((x @ x).sum())
    log(stage="tiny_matmul", ok=True, s=round(time.time() - t0, 1))

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    ks = jax.random.split(key, 3)
    batch = (
        jax.random.normal(ks[0], (cfg["batch_size"], cfg["n_samples_context"], 6)),
        jax.random.normal(ks[1], (cfg["batch_size"], cfg["sample_size"], 6)),
        jax.random.normal(ks[2], (cfg["batch_size"], 1)),
    )
    jax.block_until_ready(batch)

    stages = (("pure_xla", False, False), ("scan_path", False, True),
              ("fused_chunk1", True, True))
    for name, fused, fused_enc in stages:
        t0 = time.time()
        try:
            cfg = dict(cfg, fused_encoder=fused_enc)
            model = fc.FlowCompareModel(cfg, remat=False, fused_layers=fused)
            params, state = model.init_params(jax.random.PRNGKey(0))

            @jax.jit
            def ev(params, state, batch):
                loss, _, nats, _ = fc.inner_loop(
                    model, params, state, batch,
                    rng=jax.random.PRNGKey(2), training=False)
                return loss, nats

            loss, nats = ev(params, state, batch)
            log(stage=name, ok=True, s=round(time.time() - t0, 1),
                loss=float(loss), nats=float(nats))
        except Exception as e:
            log(stage=name, ok=False, s=round(time.time() - t0, 1),
                err=repr(e)[:200])


if __name__ == "__main__":
    main()
