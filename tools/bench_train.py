"""Full-scale training-step benchmark (the reference's actual workload:
train.py:91-173 hot loop, A100-days scale).

Measures ms/step of the jitted train step (fwd + bwd + clip + Adam +
plateau in ONE program) on the flagship dulcet-universe config at the
reference batch (B=20, 1024/1250 points), bf16 compute + f32 ldj, with the
folded scan core on and off. Writes save/bench/bench_train.json.

Usage: python tools/bench_train.py [--steps N] [--no-unfolded]
"""

import argparse
import json
import os
import sys
import time

import jax

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def measure(mode: str, n_steps: int = 5) -> dict:
    """mode: 'kernel' (Pallas fwd+bwd megakernels), 'folded' (folded
    lax.scan core + XLA autodiff), 'unfolded' (plain scan + autodiff).
    A '_spdK' suffix (e.g. kernel_spd8) runs K steps per dispatch through
    make_train_step_multi — the trainer's steps_per_dispatch path."""
    import re

    import jax.numpy as jnp

    import flowcompare_tpu as fc
    from flowcompare_tpu.train.trainer import (
        init_train_state, make_train_step, make_train_step_multi)

    spd = 1
    m_spd = re.match(r"(.+)_spd(\d+)$", mode)
    if m_spd:
        mode, spd = m_spd.group(1), int(m_spd.group(2))

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    cfg["folded_scan"] = mode != "unfolded"
    if os.environ.get("FLOWCOMPARE_BENCH_LAYERS"):
        # attribution aid: a near-empty flow stack isolates the
        # encoder/augmenter/optimizer floor of the step
        cfg["n_flow_layers"] = int(os.environ["FLOWCOMPARE_BENCH_LAYERS"])
    model = fc.FlowCompareModel(cfg, fused_layers=(mode == "kernel"))
    state = init_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model)
    bsz = cfg["batch_size"]
    # per-run salt: avoid tunnel memoization of repeated inputs (TRAP 3)
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(1), salt), 3)

    def batch(i):  # unique inputs: the tunnel memoizes identical calls
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i),
                              (bsz, cfg["n_samples_context"], 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (bsz, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (bsz, 1)),
        )

    # pre-build all batches on device: batch() is 3 eager fold_in+normal
    # pairs and each eager dispatch through the tunnel costs ~12-30 ms —
    # generating inputs inside the timed loop silently added ~40-90 ms to
    # every recorded step (discovered 2026-08-18; a real training loop
    # overlaps its input pipeline, so device-resident batches are the
    # honest model)
    if spd > 1:
        mstep = make_train_step_multi(model)

        def chunk(i):
            bs = [batch(i * spd + s) for s in range(spd)]
            return tuple(jnp.stack([b[j] for b in bs]) for j in range(3))

        warm = [chunk(100 + w) for w in range(2)]
        timed = [chunk(i) for i in range(n_steps)]
        jax.block_until_ready((warm, timed))
        for b in warm:
            state, m = mstep(state, *b)
            float(m["loss"][-1])
        t0 = time.perf_counter()
        for b in timed:
            state, m = mstep(state, *b)
            float(m["loss"][-1])
        dt = (time.perf_counter() - t0) / (n_steps * spd)
        return {"mode": f"{mode}_spd{spd}", "ms_per_step": round(1000 * dt, 1),
                "points_per_sec": round(bsz * cfg["sample_size"] / dt, 1),
                "loss_finite": bool(jax.numpy.isfinite(m["loss"][-1]))}

    warm = [batch(100 + w) for w in range(2)]
    timed = [batch(i) for i in range(n_steps)]
    jax.block_until_ready((warm, timed))

    for b in warm:  # compile + executable-load warmups
        state, m = step(state, b)
        float(m["loss"])
    t0 = time.perf_counter()
    for b in timed:
        state, m = step(state, b)
        float(m["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    return {"mode": mode, "ms_per_step": round(1000 * dt, 1),
            "points_per_sec": round(bsz * cfg["sample_size"] / dt, 1),
            "loss_finite": bool(jax.numpy.isfinite(m["loss"]))}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--no-unfolded", action="store_true")
    ap.add_argument("--modes", default=None,
                    help="comma list of kernel,folded,unfolded (overrides)")
    args = ap.parse_args()
    modes = (args.modes.split(",") if args.modes else
             (["kernel", "folded"] if args.no_unfolded else
              ["kernel", "folded", "unfolded"]))
    results = {"backend": jax.default_backend(),
               "config": "dulcet-universe bf16 B=20"}
    for mode in modes:
        results[mode] = measure(mode, args.steps)
    outdir = os.path.join(ROOT, "save", "bench")
    os.makedirs(outdir, exist_ok=True)
    path = os.path.join(outdir, "bench_train.json")
    if args.modes and os.path.exists(path):
        # partial --modes run: merge into the existing artifact
        with open(path) as f:
            prev = json.load(f)
        prev.update(results)
        results = prev
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
