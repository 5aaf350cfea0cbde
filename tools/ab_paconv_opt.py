"""Chip A/B of the PAConv-encoder optimization flags (VERDICT r3 item 3).

save/bench/ablate_paconv.json split good-surf's 82.9 ms/batch into flow
55.4 + encoder 30.5 (kNN/gather ~13, assign-score conv ~10, FPS ~4.5).
Four passes of this tool (artifacts ab_paconv_opt{,2,3,4}.json) measured
each lever same-worker and took the encoder to 15.25 ms — the history and
the production defaults live in ops/{paconv_ops,knn,fps}.py docstrings
and CLAUDE.md's round-4 ledger. The current variant matrix re-validates
the production flag set against single-flag reversions; edit `variants`
to probe a new lever.

Each variant is a DIFFERENTLY-NAMED jitted program (MEASUREMENT TRAP 3:
the tunnel memoizes by function name — identically-named cross-variant
probes can be served each other's results) with device-resident inputs
(TRAP 2) and fresh salts (TRAP 1). Embedding parity vs the baseline is
recorded per variant (fps kernel must be bit-exact; conv forms drift at
bf16 rounding).

Writes save/bench/ab_paconv_opt.json (--out to redirect) and prints the
winning flag set. Pure-XLA + small-Pallas programs: runs on a degraded
compile host.

Usage: python tools/ab_paconv_opt.py [--preset good-surf] [--out PATH]
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
    ap.add_argument("--out", default="save/bench/ab_paconv_opt.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"

    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import fps as fps_mod
    from flowcompare_tpu.ops import knn as knn_mod
    from flowcompare_tpu.ops import paconv_ops as pco

    cfg = fc.get_config(args.preset)
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B, NC = cfg["batch_size"], cfg["n_samples_context"]
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(13), salt), 4)

    def ctx_chunk(i):
        return (params, state,
                jax.random.normal(jax.random.fold_in(ks[0], i),
                                  (CH, B, NC, 6)))

    parity_ctx = jax.random.normal(ks[1], (CH, B, NC, 6))

    def make_enc(tag, use_model=None):
        """Freshly-traced, uniquely-NAMED encoder-chunk program under the
        currently-set module flags."""
        mdl = use_model if use_model is not None else model

        def enc(params, state, ctxs):
            def step(c, ctx):
                out, _ = mdl.embed(params, state, ctx, training=False)
                return c + 1, out
            _, outs = jax.lax.scan(step, 0, ctxs)
            return outs
        enc.__name__ = f"enc_{tag}"
        return jax.jit(enc)

    def set_flags(fps_kernel, form, topk, gather="take"):
        fps_mod._USE_KERNEL = fps_kernel
        pco._FORM = form
        knn_mod._TOPK_IMPL = topk
        knn_mod._GATHER_IMPL = gather

    # round-4 fourth pass: production is bf16 + concat + approx + onehot +
    # fps-kernel (passes 1-3). Pass 3 found the f32 encoder BEATS the bf16
    # policy on the take-gather config (17.58 vs 22.94 same-worker) — this
    # matrix decides the PAConv encoder dtype with the fps kernel and the
    # (now f32-capable, HIGHEST-precision) one-hot gather in play.
    variants = [
        ("base",            (True,  "concat", "approx", "onehot")),
        ("f32_take_fps",    (True,  "concat", "approx", "take",   "f32")),
        ("f32_onehot_fps",  (True,  "concat", "approx", "onehot", "f32")),
        ("bf16_take_fps",   (True,  "concat", "approx", "take")),
    ]

    results, embs = {}, {}
    # f32-encoder control: same worker, same inputs — isolates the bf16
    # eval policy's effect from worker-to-worker variance
    model_f32 = fc.FlowCompareModel(dict(cfg, compute_dtype=None),
                                    remat=False, fused_layers=True)

    def enc_f32(params, state, ctxs):
        def step(c, ctx):
            out, _ = model_f32.embed(params, state, ctx, training=False)
            return c + 1, out
        _, outs = jax.lax.scan(step, 0, ctxs)
        return outs
    enc_f32.__name__ = f"enc_f32ctl_{salt % 997}"
    try:
        results["f32_encoder"] = round(
            timed(jax.jit(enc_f32), ctx_chunk) * 1e3, 2)
    except Exception as e:
        results["f32_encoder"] = f"error: {str(e)[:200]}"
    print(f"f32_encoder: {results['f32_encoder']} ms/batch", flush=True)

    for tag, flags in variants:
        f32 = len(flags) == 5
        set_flags(*flags[:4])
        enc = make_enc(tag, use_model=(model_f32 if f32 else None))
        try:
            results[tag] = round(timed(enc, ctx_chunk) * 1e3, 2)
            embs[tag] = enc(params, state, parity_ctx)
        except Exception as e:  # a variant failing to compile is a result
            results[tag] = f"error: {str(e)[:200]}"
        print(f"{tag}: {results[tag]} ms/batch", flush=True)

    def beats_base(tag, margin=0.98):
        # flag flips need a real (>2%) win — step-time noise through the
        # tunnel is several ms, and ties must not flip production flags
        return (isinstance(results.get(tag), float)
                and isinstance(results.get("base"), float)
                and results[tag] <= margin * results["base"])

    base = embs.get("base")
    parity = {}
    if base is not None:
        bf = jnp.asarray(base, jnp.float32)
        scale = float(jnp.max(jnp.abs(bf))) or 1.0
        for tag, e in embs.items():
            d = float(jnp.max(jnp.abs(jnp.asarray(e, jnp.float32) - bf)))
            parity[tag] = round(d / scale, 8)

    fps_win = True
    conv_w = "concat"
    topk_w = "approx"
    f32_enc_wins = (beats_base("f32_take_fps")
                    or beats_base("f32_onehot_fps"))
    gather_w = "onehot"
    if f32_enc_wins and isinstance(results.get("f32_take_fps"), float) \
            and isinstance(results.get("f32_onehot_fps"), float) \
            and results["f32_take_fps"] < results["f32_onehot_fps"]:
        gather_w = "take"
    winners = {"fps_kernel": fps_win, "conv_form": conv_w,
               "topk_impl": topk_w, "gather_impl": gather_w,
               "encoder_f32": f32_enc_wins}

    # full-model eval with the winning flags vs the committed preset bench
    set_flags(fps_win, conv_w, topk_w, gather_w)

    def full(params, state, ctxs, tgts, extras):
        def step(c, xs):
            loss, _, nats, _ = fc.inner_loop(model, params, state, xs,
                                             rng=ks[3], training=False)
            return c + 1, nats
        _, outs = jax.lax.scan(step, 0, (ctxs, tgts, extras))
        return outs
    full.__name__ = f"full_win_{salt % 997}"
    fullj = jax.jit(full)

    def full_chunk(i):
        return (params, state,
                jax.random.normal(jax.random.fold_in(ks[0], i),
                                  (CH, B, NC, 6)),
                jax.random.normal(jax.random.fold_in(ks[1], i),
                                  (CH, B, cfg["sample_size"], 6)),
                jax.random.normal(jax.random.fold_in(ks[2], i), (CH, B, 1)))

    t_full = timed(fullj, full_chunk)
    pps = B * cfg["sample_size"] / t_full
    out = {
        "preset": args.preset, "chunk": CH, "batch": B,
        "encoder_ms_per_batch": results,
        "parity_max_rel_vs_base": parity,
        "winners": winners,
        "full_ms_per_batch_with_winners": round(t_full * 1e3, 2),
        "full_points_per_sec": round(pps, 1),
        "recorded": time.strftime("%Y-%m-%d %H:%M"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
