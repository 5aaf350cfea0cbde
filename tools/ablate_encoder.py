"""Trace-time ablation of the eval DGCNN encoder (chip).

The encoder's honest chunked device time measured 20.25 ms/batch
(save/bench/encoder_time.json) — ~1/3 of the whole chunked eval batch —
so this decomposes it the same way tools/ablate_kernel.py decomposes the
flow megakernel: re-trace enc_chunk with pieces removed and subtract.

Variants (timing only — outputs are wrong for every variant except full):
  full    — production fused eval path
  noknn   — edge_neighbor_max replaced by a global max over u' (kills the
            Pallas kNN kernel: distance matmul, binary search, one-hot
            extraction, 4 kernel launches; keeps u/c matmuls + BN + glue)
  nohead  — conv5 + out_mlp head replaced by a thin projection of the
            stage-concat (kills the (25k, 512) MLP chain)
  nostages— the 4 edge stages replaced by a single linear lift of x
            (isolates head + glue)

Usage: python tools/ablate_encoder.py [--out save/bench/ablate_encoder.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 6
CH = 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="save/bench/ablate_encoder.json")
    args = ap.parse_args()

    z = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(z[0, 0]) == 8.0, "chip unhealthy"
    print("chip healthy", flush=True)

    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import dgcnn as dg
    from flowcompare_tpu.ops import edgeconv_pallas as ep

    cfg = fc.get_config("dulcet-universe")
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B = cfg["batch_size"]
    ks = jax.random.split(jax.random.PRNGKey(1), 2)

    # this tool ablates the PER-STAGE fused path — its monkeypatches are
    # bypassed by the one-launch megakernel branch, so force it off
    dg._ONE_LAUNCH = False

    orig_enm = ep.edge_neighbor_max
    orig_stage = dg._fused_edge_stage
    orig_mlp = dg.apply_mlp

    def noknn_enm(x, u, k, **kw):
        # global max over the item's points, broadcast per row — dead-codes
        # the distance matmul / binary search / one-hot extraction
        return jnp.broadcast_to(jnp.max(u, axis=-2, keepdims=True), u.shape)

    def nostages_stage(p, s, h, k, **kw):
        w = p["conv"]["w"]
        c_in = h.shape[-1]
        return (h @ w[:c_in]).astype(h.dtype)

    def nohead_mlp(p, h, nonlin):
        w0 = p[0][0] if isinstance(p, (list, tuple)) else None
        # thin projection to the right output width, no hidden chain
        out_dim = cfg["input_embedding_dim"]
        return h[..., :out_dim].astype(h.dtype)

    variants = {
        "full": {},
        "noknn": {"enm": noknn_enm},
        "nohead": {"mlp": nohead_mlp},
        "nostages": {"stage": nostages_stage},
    }

    results = {}
    for name, patch in variants.items():
        ep.edge_neighbor_max = patch.get("enm", orig_enm)
        dg._fused_edge_stage = patch.get("stage", orig_stage)
        dg.apply_mlp = patch.get("mlp", orig_mlp)
        if name == "nohead":
            # also skip conv5: route concat straight to the (patched) head
            dg_conv = dg._conv_bn_leaky
            dg._conv_bn_leaky = lambda p, s, x, training: (x, s)
        try:
            @jax.jit
            def enc_chunk(params, state, ptss):
                def body(carry, pts):
                    out, _ = model.embed(params, state, pts, training=False)
                    return carry, jnp.sum(out)
                _, sums = jax.lax.scan(body, 0, ptss)
                return sums

            def mk(i):
                return jax.random.normal(
                    jax.random.fold_in(ks[0], i),
                    (CH, B, cfg["n_samples_context"], 6))

            warm = [mk(100 + w) for w in range(2)]
            timed = [mk(i) for i in range(REPS)]
            jax.block_until_ready((warm, timed))
            for wv in warm:
                float(enc_chunk(params, state, wv)[0])
            t0 = time.perf_counter()
            for tv in timed:
                float(enc_chunk(params, state, tv)[0])
            ms = 1000 * (time.perf_counter() - t0) / (REPS * CH)
            results[name] = round(ms, 2)
            print(name, results[name], flush=True)
        finally:
            ep.edge_neighbor_max = orig_enm
            dg._fused_edge_stage = orig_stage
            dg.apply_mlp = orig_mlp
            if name == "nohead":
                dg._conv_bn_leaky = dg_conv

    full = results.get("full")
    rec = {"ms_per_batch": results,
           "deltas_vs_full": {k: round(full - v, 2)
                              for k, v in results.items() if k != "full"}}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
