"""Chip A/B of the fused SA-grouping kernel (ops/sa_group_pallas.py,
round-5, VERDICT r4 item 4) vs the XLA grouping path on the PAConv
encoder.

Grouping/kNN is ~9.5 ms of the 15.6 ms good-surf encoder
(save/bench/ablate_paconv_final.json); the fused kernel removes the
(B, M*K, N) HBM one-hot and the XLA top-k. Parity expectation: the SA
level OUTPUT is invariant to the kernel's index-ordered slot convention
(see sa_group_pallas docstring), so the embedding delta should be ~0
(bf16-tie-admission differences at MXU-rounded distance boundaries are
the only allowed source).

Same-worker methodology: differently-NAMED jitted programs (TRAP 3),
device-resident inputs (TRAP 2), fresh salts (TRAP 1). Writes
save/bench/ab_sa_group.json. The fused variant needs the compile host to
accept the kernel — a compile failure is recorded as a result, not a
crash.

Usage: python tools/ab_sa_group.py [--preset good-surf] [--out PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flowcompare_tpu.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

CH = 10
REPS = 4


def timed(fn, make_args, reps=REPS):
    warm = [make_args(1000 + w) for w in range(2)]
    args = [make_args(i) for i in range(reps)]
    jax.block_until_ready((warm, args))
    for a in warm:
        float(jnp.asarray(fn(*a)).ravel()[0])
    t0 = time.perf_counter()
    for a in args:
        float(jnp.asarray(fn(*a)).ravel()[0])
    return (time.perf_counter() - t0) / (reps * CH)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="good-surf")
    ap.add_argument("--out", default="save/bench/ab_sa_group.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"

    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import paconv

    cfg = fc.get_config(args.preset)
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B, NC = cfg["batch_size"], cfg["n_samples_context"]
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(17), salt), 4)

    def ctx_chunk(i):
        return (params, state,
                jax.random.normal(jax.random.fold_in(ks[0], i),
                                  (CH, B, NC, 6)))

    parity_ctx = jax.random.normal(ks[1], (CH, B, NC, 6))

    def make_enc(tag):
        def enc(params, state, ctxs):
            def step(c, ctx):
                out, _ = model.embed(params, state, ctx, training=False)
                return c + 1, out
            _, outs = jax.lax.scan(step, 0, ctxs)
            return outs
        enc.__name__ = f"enc_sag_{tag}_{salt % 997}"
        return jax.jit(enc)

    results, embs = {}, {}
    for tag, fused in (("xla_grouping", False), ("fused_grouping", True)):
        paconv._FUSED_GROUPING = fused
        enc = make_enc(tag)
        try:
            results[tag] = round(timed(enc, ctx_chunk) * 1e3, 2)
            embs[tag] = enc(params, state, parity_ctx)
        except Exception as e:
            results[tag] = f"error: {str(e)[:250]}"
        print(f"{tag}: {results[tag]} ms/batch", flush=True)
    paconv._FUSED_GROUPING = True

    parity = None
    if len(embs) == 2:
        a = jnp.asarray(embs["xla_grouping"], jnp.float32)
        b = jnp.asarray(embs["fused_grouping"], jnp.float32)
        scale = float(jnp.max(jnp.abs(a))) or 1.0
        parity = round(float(jnp.max(jnp.abs(a - b))) / scale, 8)

    both = all(isinstance(results.get(t), float)
               for t in ("xla_grouping", "fused_grouping"))
    out = {
        "preset": args.preset, "chunk": CH, "batch": B,
        "encoder_ms_per_batch": results,
        "parity_max_rel": parity,
        "fused_wins": bool(both and results["fused_grouping"]
                           <= 0.98 * results["xla_grouping"]),
        "recorded": time.strftime("%Y-%m-%d %H:%M"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
