"""Per-point CHANGE-MAP parity on chip: fused-bf16 eval path vs f32 scan.

The north star includes "identical per-point change scores", and
kernel_nats_parity records a per-point log-prob tail delta of ~1.7 nats
(bf16 kernel vs f32 scan) even though mean nats agree to 2e-3. This tool
measures what that tail does to the DELIVERABLE: the per-point change
classification of eval/evaluate.log_prob_to_change (reference
test_flow.py:249-275). Over N full-scale batches it computes both paths'
change maps at the reference threshold (multiple=5.4), at aggressive
thresholds (1/2/3 sigma — where flips are likeliest, since 5.4 sigma
classifies almost nothing on in-distribution data), and at the reference's
hard_cutoff=5, and records classification agreement + score deltas into
save/bench/change_map_parity.json.

Both paths run as ONE jitted chunked program each with DIFFERENT function
names (MEASUREMENT TRAP 3, CLAUDE.md: the tunnel can serve same-named
programs memoized results across jits).

Run:  PYTHONPATH=/root/.axon_site python tools/change_map_parity.py [N_BATCHES]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MULTIPLES = (1.0, 2.0, 3.0, 5.4)
HARD_CUTOFFS = (5.0,)


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.eval.evaluate import log_prob_to_change

    # --xla-encoder: run the fused path with the XLA (gather) encoder
    # instead of the one-launch kernel. The kernel is BIT-EXACT vs the
    # bf16 gather path (docs/kernels.md), so the measured log-probs are
    # identical — this exists for degraded compile hosts that SIGKILL the
    # encoder megakernel (CLAUDE.md 2026-08-20) while still compiling the
    # flow megakernel.
    xla_encoder = "--xla-encoder" in sys.argv
    # --grouping-ab: compare the fused path against ITSELF with the XLA
    # grouping formulation instead of the f32 scan — isolates the fused
    # SA-grouping kernel (ops/sa_group_pallas.py, PAConv eval default) at
    # the end metric. Both sides are fused programs, so this runs on a
    # degraded compile host that rejects the f32 scan program.
    grouping_ab = "--grouping-ab" in sys.argv
    # --checkpoint PATH: measure with TRAINED weights (realistic log-prob
    # spread) instead of random init; inputs stay the same synthetic draws
    # --preset NAME: measure another model family. NOTE degraded-host
    # compatibility varies by family: PAConv presets (good-surf,
    # summer-terrain) have pure-XLA encoders and always run, but the
    # DGCNN presets (incl. helpful-sponge — its fused eval path contains
    # the one-launch TRUNK kernel) need --xla-encoder when the compile
    # host is rejecting encoder kernels (CLAUDE.md 2026-08-20)
    ckpt_path = None
    preset = "dulcet-universe"
    argv = []
    it = iter(sys.argv[1:])
    for a in it:
        if a in ("--checkpoint", "--preset"):
            try:
                value = next(it)
            except StopIteration:
                raise SystemExit(f"{a} needs a value")
            if a == "--checkpoint":
                ckpt_path = value
            else:
                preset = value
        elif a.startswith("--"):
            # fail loudly on typos — a silently-dropped flag would run an
            # expensive chip measurement in the wrong configuration
            if a not in ("--xla-encoder", "--grouping-ab"):
                raise SystemExit(
                    f"unknown option {a!r} (known: --xla-encoder, "
                    "--grouping-ab, --checkpoint PATH, --preset NAME)")
        else:
            argv.append(a)
    n_batches = int(argv[0]) if argv else 20
    cfg = fc.get_config(preset)
    B = cfg["batch_size"]
    base = fc.FlowCompareModel(cfg, remat=False)  # f32 scan reference
    fast = base.with_options(fused_layers=True, compute_dtype="bfloat16",
                             **({"fused_encoder": False} if xla_encoder
                                else {}))
    params, state = base.init_params(jax.random.PRNGKey(0))
    if ckpt_path:
        from flowcompare_tpu.train.checkpoint import (load_checkpoint,
                                                      restore_into)
        loaded = load_checkpoint(ckpt_path)
        params = restore_into(params, loaded["params"])
        state = restore_into(state, loaded["state"])

    salt = int(time.time() * 1e3) % (2 ** 31)  # fresh inputs (memo tunnel)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(11), salt), 4)

    if ckpt_path:
        # trained weights need IN-DISTRIBUTION inputs: a model trained on
        # the synthetic scenes produces non-finite bf16 log-probs on pure
        # gaussian noise (observed 2026-08-20 — OOD latents overflow),
        # which would measure pathology, not path parity
        from flowcompare_tpu.data import SyntheticVoxelDataset
        ds = SyntheticVoxelDataset(
            n_items=B * 64, batch_size=B, sample_size=cfg["sample_size"],
            n_samples_context=cfg["n_samples_context"], with_extra=True,
            seed=salt % 65536)
        ds_iter = iter(ds)

        def make_batch(i):
            nonlocal ds_iter
            try:
                ctx0, target1, extra = [jnp.asarray(t)
                                        for t in next(ds_iter)]
            except StopIteration:
                ds_iter = iter(ds)
                ctx0, target1, extra = [jnp.asarray(t)
                                        for t in next(ds_iter)]
            return ctx0, target1, ctx0[:, :cfg["sample_size"], :], extra
    else:
        def make_batch(i):
            """ctx0 (t0 context), target1 (t1 small), target0 (t0 small =
            leading subset of the t0 cloud, the self-pair), extra."""
            ctx0 = jax.random.normal(jax.random.fold_in(ks[0], i),
                                     (B, cfg["n_samples_context"], 6))
            target1 = jax.random.normal(jax.random.fold_in(ks[1], i),
                                        (B, cfg["sample_size"], 6))
            target0 = ctx0[:, :cfg["sample_size"], :]
            extra = jax.random.normal(jax.random.fold_in(ks[2], i), (B, 1))
            return ctx0, target1, target0, extra

    def _both_directions(model, params, state, batch, rng):
        """lp(t1|t0) and lp(t0|t0) in one dispatch (stacked batch axis)."""
        ctx0, target1, target0, extra = batch
        stacked = (jnp.concatenate([ctx0, ctx0]),
                   jnp.concatenate([target1, target0]),
                   jnp.concatenate([extra, extra]))
        _, lp, _, _ = fc.inner_loop(model, params, state, stacked, rng=rng,
                                    training=False)
        return lp[:B], lp[B:]

    # differently-named jits per variant — see module docstring
    @jax.jit
    def lp_pair_fused_bf16(params, state, batch, rng):
        return _both_directions(fast, params, state, batch, rng)

    if grouping_ab:
        from flowcompare_tpu.encoders import paconv as _paconv
        if not getattr(_paconv, "_FUSED_GROUPING", False):
            raise SystemExit("--grouping-ab needs a PAConv preset with the "
                             "fused grouping default on (e.g. good-surf)")

        @jax.jit
        def lp_pair_fused_xlagroup(params, state, batch, rng):
            return _both_directions(fast, params, state, batch, rng)

        lp_pair_scan_f32 = lp_pair_fused_xlagroup
        # _FUSED_GROUPING is read at TRACE time: trace each differently-
        # named program under its own value, then pin the default back
        warm = make_batch(0)
        wrng = jax.random.fold_in(ks[3], 10 ** 6)
        jax.block_until_ready(warm)
        _paconv._FUSED_GROUPING = True
        jax.block_until_ready(lp_pair_fused_bf16(params, state, warm, wrng))
        _paconv._FUSED_GROUPING = False
        jax.block_until_ready(
            lp_pair_fused_xlagroup(params, state, warm, wrng))
        _paconv._FUSED_GROUPING = True
    else:
        @jax.jit
        def lp_pair_scan_f32(params, state, batch, rng):
            return _both_directions(base, params, state, batch, rng)

    stats = {f"multiple_{m}": {"agree": 0, "total": 0, "flips": 0,
                               "changed_a": 0, "changed_b": 0,
                               "max_score_delta": 0.0}
             for m in MULTIPLES}
    stats.update({f"hard_{h}": {"agree": 0, "total": 0, "flips": 0,
                                "changed_a": 0, "changed_b": 0,
                                "max_score_delta": 0.0}
                  for h in HARD_CUTOFFS})
    lp_max_delta = 0.0
    lp_mean_delta = 0.0
    nonfinite = {"fused": 0, "scan": 0, "mismatch": 0}

    for i in range(n_batches):
        batch = make_batch(1000 + i)
        jax.block_until_ready(batch)
        rng = jax.random.fold_in(ks[3], i)
        lp10_a, lp00_a = lp_pair_fused_bf16(params, state, batch, rng)
        lp10_b, lp00_b = lp_pair_scan_f32(params, state, batch, rng)
        lp10_a, lp00_a, lp10_b, lp00_b = map(
            np.asarray, (lp10_a, lp00_a, lp10_b, lp00_b))
        if i == 0 and np.array_equal(lp10_a, lp10_b):
            raise RuntimeError(
                "bit-identical cross-variant result — tunnel memoization "
                "(MEASUREMENT TRAP 3); results are not trustworthy")
        # non-finite accounting (and keep the delta stats finite-only):
        # -inf/NaN log-probs are possible in bf16 near distribution tails;
        # clamp_infs handles them downstream exactly like the reference
        fa = np.isfinite(lp10_a) & np.isfinite(lp00_a)
        fb = np.isfinite(lp10_b) & np.isfinite(lp00_b)
        nonfinite["fused"] += int((~fa).sum())
        nonfinite["scan"] += int((~fb).sum())
        nonfinite["mismatch"] += int((fa != fb).sum())
        both = fa & fb
        if both.any():
            lp_max_delta = max(
                lp_max_delta,
                float(np.max(np.abs(lp10_a - lp10_b)[both])),
                float(np.max(np.abs(lp00_a - lp00_b)[both])))
            lp_mean_delta += float(
                np.mean(np.abs(lp10_a - lp10_b)[both])) / n_batches

        def record(key, **kw):
            ca = np.asarray(log_prob_to_change(
                jnp.asarray(lp10_a), jnp.asarray(lp00_a), **kw))
            cb = np.asarray(log_prob_to_change(
                jnp.asarray(lp10_b), jnp.asarray(lp00_b), **kw))
            a_changed, b_changed = ca > 0, cb > 0
            s = stats[key]
            s["agree"] += int(np.sum(a_changed == b_changed))
            s["total"] += a_changed.size
            s["flips"] += int(np.sum(a_changed != b_changed))
            s["changed_a"] += int(np.sum(a_changed))
            s["changed_b"] += int(np.sum(b_changed))
            either = a_changed | b_changed
            if either.any():
                s["max_score_delta"] = max(
                    s["max_score_delta"],
                    float(np.max(np.abs(ca - cb)[either])))

        for m in MULTIPLES:
            record(f"multiple_{m}", multiple=m)
        for h in HARD_CUTOFFS:
            record(f"hard_{h}", hard_cutoff=h)
        print(f"batch {i + 1}/{n_batches}: lp_max_delta={lp_max_delta:.3g}",
              flush=True)

    out = {"n_batches": n_batches, "batch_size": B,
           "points_per_map": cfg["sample_size"],
           "preset": preset,
           "paths": ("fused bf16 (SA-grouping kernel) vs fused bf16 "
                     "(XLA grouping) — ops/sa_group_pallas end-metric A/B"
                     if grouping_ab else
                     "fused bf16 flow megakernel + bf16 XLA encoder "
                     "(bit-exact vs the encoder kernel) vs f32 lax.scan"
                     if xla_encoder else
                     "fused bf16 megakernels vs f32 lax.scan"),
           "weights": (f"trained checkpoint {os.path.basename(ckpt_path)}"
                       if ckpt_path else "random init"),
           "logprob_max_abs_delta": round(lp_max_delta, 4),
           "logprob_mean_abs_delta": round(lp_mean_delta, 6),
           "nonfinite_logprobs": nonfinite,
           "thresholds": {}}
    for key, s in stats.items():
        out["thresholds"][key] = {
            "agreement": round(s["agree"] / s["total"], 6),
            "flipped_points": s["flips"],
            "total_points": s["total"],
            "changed_frac_fused": round(s["changed_a"] / s["total"], 6),
            "changed_frac_scan": round(s["changed_b"] / s["total"], 6),
            "max_score_delta_on_changed": round(s["max_score_delta"], 4),
        }
    print(json.dumps(out, indent=1))
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "save", "bench")
    os.makedirs(outdir, exist_ok=True)
    stem = ("change_map_parity" if preset == "dulcet-universe"
            else f"change_map_parity_{preset}")
    if grouping_ab:
        stem += "_grouping"
    name = f"{stem}_trained.json" if ckpt_path else f"{stem}.json"
    with open(os.path.join(outdir, name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
