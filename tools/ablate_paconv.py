"""Where does the PAConv preset's eval batch go? (VERDICT r3 item 3)

good-surf / summer-terrain sit at ~4.0x vs the flagship's ~5x; the PAConv
encoder is plain XLA (never got the Pallas treatment). Before fusing
anything, split the ~85 ms/batch into encoder vs flow vs overhead, and the
encoder into grouping (FPS+kNN+gather) vs PAConv conv (scorenet +
assign_score) vs FP/out-head — so the fusion target is measured, not
guessed.

All programs are chunked (lax.scan over CH batches per dispatch, like
bench.py's dataset-eval mode), warmed twice with unique inputs, synced
with float() per chunk. PAConv programs are pure XLA + the flow megakernel
— both compile on a degraded host (CLAUDE.md 2026-08-20).

Usage: python tools/ablate_paconv.py [--preset good-surf]
                                     [--out save/bench/ablate_paconv.json]
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

CH = 10      # batches per dispatch
REPS = 4     # timed chunks per measurement


def timed_chunk(fn, make_chunk, reps=REPS):
    warm = [make_chunk(1000 + w) for w in range(2)]
    args = [make_chunk(i) for i in range(reps)]
    jax.block_until_ready((warm, args))
    for a in warm:
        out = fn(*a)
        float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for a in args:
        out = fn(*a)
        float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / (reps * CH)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="good-surf")
    ap.add_argument("--out", default="save/bench/ablate_paconv.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"

    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import paconv as pc

    cfg = fc.get_config(args.preset)
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B = cfg["batch_size"]
    NC = cfg["n_samples_context"]
    salt = int(time.time() * 1e3) % (2 ** 31)
    ks = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(9), salt), 4)
    ep = params["embedder"]
    es = state["embedder"]

    def ctx_chunk(i):
        return (jax.random.normal(jax.random.fold_in(ks[0], i),
                                  (CH, B, NC, 6)),)

    def full_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[0], i), (CH, B, NC, 6)),
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (CH, B, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (CH, B, 1)),
        )

    # NEVER close over params/state/embeddings: the remote compile helper
    # rejects huge constant uploads (HTTP 413, CLAUDE.md) — every big array
    # is an ARGUMENT; timed_chunk's make_chunk prepends the operand tuple.
    def scan_over(body, n_ops, tag):
        # unique program NAME per variant: the tunnel memoizes by jitted
        # function name + input bits (MEASUREMENT TRAP 3, CLAUDE.md), and
        # the sa_* variants share shapes AND inputs
        def run(*args):
            ops, chunk = args[:n_ops], args[n_ops:]

            def step(c, xs):
                return c + 1, body(*ops, *((xs,) if len(chunk) == 1 else xs))
            _, outs = jax.lax.scan(
                step, 0, chunk[0] if len(chunk) == 1 else chunk)
            return outs
        run.__name__ = f"run_{tag}"
        return jax.jit(run)

    results = {}

    # 1. full nats-eval (fused flow megakernel + PAConv encoder)
    def full_body(params, state, ctx, tgt, extra):
        loss, _, nats, _ = fc.inner_loop(model, params, state,
                                         (ctx, tgt, extra),
                                         rng=ks[3], training=False)
        return nats
    results["full"] = timed_chunk(
        scan_over(full_body, 2, "full"), lambda i: (params, state) + full_chunk(i))

    # 2. encoder alone
    def enc_body(params, state, ctx):
        out, _ = model.embed(params, state, ctx, training=False)
        return jnp.sum(out, axis=(1, 2))
    results["encoder"] = timed_chunk(
        scan_over(enc_body, 2, "enc"), lambda i: (params, state) + ctx_chunk(i))

    # 3. flow alone (embeddings precomputed once, device-resident)
    emb0, _ = jax.jit(lambda p, s, c: model.embed(p, s, c, training=False))(
        params, state, jax.random.normal(ks[0], (B, NC, 6)))

    def flow_chunk(i):
        return (
            jax.random.normal(jax.random.fold_in(ks[1], i),
                              (CH, B, cfg["sample_size"], 6)),
            jax.random.normal(jax.random.fold_in(ks[2], i), (CH, B, 1)),
        )

    def flow_body(params, emb, tgt, extra):
        ex = None
        if cfg["using_extra_context"]:
            ex = jnp.broadcast_to(extra[:, None, :],
                                  (B, tgt.shape[1], extra.shape[-1]))
        lp = model.log_prob(params, tgt[..., :model.input_dim], emb, ex,
                            rng=ks[3], training=False)
        return -jnp.mean(lp)
    results["flow_only"] = timed_chunk(
        scan_over(flow_body, 2, "flow"), lambda i: (params, emb0) + flow_chunk(i))

    # --- encoder internals -------------------------------------------------
    dt = jnp.bfloat16

    cheap_ws = []
    for lvl in range(4):
        spec = pc.SA_MLPS(3)[lvl]
        in_dim = spec[0] + 3              # grouped feats + xyz diff
        cheap_ws.append(0.05 * jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(0), lvl),
            (in_dim, spec[-1]), dt))

    def sa_chain(eparams, estate, cheap_w, pointcloud, *,
                 cheap_conv=False, strided_fps=False):
        """The 4 SA levels only, optionally with (a) the PAConv conv chain
        replaced by one cheap linear+max of identical output shape, and/or
        (b) FPS replaced by a strided index — isolating conv vs sampling
        cost while keeping every downstream shape identical."""
        xyz = pointcloud[..., :3]
        feats = pointcloud[..., 3:].astype(dt)
        tot = 0.0
        for lvl in range(4):
            npoint = xyz.shape[1] // 4
            if strided_fps:
                idx = jnp.broadcast_to(
                    jnp.arange(npoint, dtype=jnp.int32)[None, :] * 4,
                    (xyz.shape[0], npoint))
            else:
                idx = pc.furthest_point_sampling(xyz, npoint)
            new_xyz = pc.gather_neighbors(xyz, idx[..., None])[:, :, 0]
            knn_idx = pc.knn_indices(new_xyz, xyz, pc.NSAMPLE, self_idx=idx)
            grouped_xyz = pc.gather_neighbors(xyz, knn_idx)
            gdiff = (grouped_xyz - new_xyz[:, :, None, :]).astype(dt)
            gfeat = pc.gather_neighbors(feats, knn_idx)
            h = jnp.concatenate((gdiff, gfeat), axis=-1)
            if cheap_conv:
                h = jnp.maximum(h @ cheap_w[lvl], 0.0)
            else:
                for lp, ls in zip(eparams["sa"][lvl], estate["sa"][lvl]):
                    h, _ = pc._apply_paconv_layer(lp, ls, h, gdiff,
                                                  training=False)
            feats = jnp.max(h, axis=2)
            xyz = new_xyz
            tot = tot + jnp.sum(feats[:, 0, :1].astype(jnp.float32), axis=-1)
        return tot

    for name, kw in (("sa_full", {}),
                     ("sa_cheap_conv", {"cheap_conv": True}),
                     ("sa_strided_fps", {"strided_fps": True})):
        def body(ep_, es_, cw_, ctx, _kw=kw):
            return sa_chain(ep_, es_, cw_, ctx, **_kw)
        results[name] = timed_chunk(
            scan_over(body, 3, name),
            lambda i, _n=name: (ep, es, cheap_ws) + ctx_chunk(i))

    out = {
        "preset": args.preset,
        "chunk": CH,
        "batch": B,
        "ms_per_batch": {k: round(v * 1e3, 2) for k, v in results.items()},
        "derived_ms": {
            "flow_share": round(results["flow_only"] * 1e3, 2),
            "encoder_share": round(results["encoder"] * 1e3, 2),
            "sa_levels": round(results["sa_full"] * 1e3, 2),
            "fp_plus_head": round(
                (results["encoder"] - results["sa_full"]) * 1e3, 2),
            "paconv_conv(scorenet+assign)": round(
                (results["sa_full"] - results["sa_cheap_conv"]) * 1e3, 2),
            "fps_cost": round(
                (results["sa_full"] - results["sa_strided_fps"]) * 1e3, 2),
        },
        "recorded": time.strftime("%Y-%m-%d %H:%M"),
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
