"""Which ENCODER-KERNEL VARIANT will the degraded compile host accept?

Round-4 facts (CLAUDE.md): during compile-helper degradation the eval
encoder kernels (one-launch AND per-stage) get SIGKILLed/hung, while the
TRAIN edgeconv kernel — which contains the SAME _knn_select_ranks binary
search + packed prefix — still compiles. The structural difference is the
eval path's extraction codegen: _UNROLL_EXTRACT straight-lines 8 build+dot
pairs and _TRANSPOSED_EXTRACT emits k=40 scalar-compare slot passes, both
of which multiply the Mosaic IR the helper must chew. Hypothesis: a
ROLLED (and/or row-major) eval variant compiles degraded at a few ms/batch
cost, giving bench.py a near-full-perf rung instead of the 2.58x XLA rung.

Each variant compiles in a FRESH subprocess (a SIGKILLed helper can leave
the backend client unusable) with the persistent compile cache ENABLED, so
every success is banked for later bench runs. Results append to
save/bench/probe_compile_variants.json.

Usage:
  python tools/probe_compile_variants.py                  # default ladder
  python tools/probe_compile_variants.py v1 v2 ...        # named variants
  python tools/probe_compile_variants.py --child <name>   # (internal)
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
OUT = os.path.join(ROOT, "save", "bench", "probe_compile_variants.json")
CHILD_TIMEOUT_S = 600

# name -> (one_launch, flag overrides on ops.edgeconv_pallas)
VARIANTS = {
    # production config (the proven degraded-host victim) — baseline
    "onelaunch_prod": (True, {}),
    # rolled extraction, still transposed: removes the 8x straight-line
    # build+dot unroll
    "perstage_rolled_t": (False, {"_UNROLL_EXTRACT": False}),
    # row-major rolled: structurally closest to the train kernel that
    # compiles degraded (no transposed slot passes, fori extraction)
    "perstage_rowmajor_rolled": (False, {"_UNROLL_EXTRACT": False,
                                         "_TRANSPOSED_EXTRACT": False,
                                         "_EXTRACT_X": False}),
    # row-major but unrolled (isolates transpose vs unroll as the hog)
    "perstage_rowmajor_unrolled": (False, {"_TRANSPOSED_EXTRACT": False,
                                           "_EXTRACT_X": False}),
    "onelaunch_rolled_t": (True, {"_UNROLL_EXTRACT": False}),
    "onelaunch_rowmajor_rolled": (True, {"_UNROLL_EXTRACT": False,
                                         "_TRANSPOSED_EXTRACT": False,
                                         "_EXTRACT_X": False}),
    # row-major rolled + low-rank extraction (the one axis not yet probed
    # 2026-08-21): extract_x only changes WHICH rows the one-hot matmul
    # gathers (x instead of u), not the extraction codegen shape — if the
    # degraded helper accepts it, the rolled rung gains the ~2 ms/batch
    # extract_x win back
    "onelaunch_rowmajor_rolled_x": (True, {"_UNROLL_EXTRACT": False,
                                           "_TRANSPOSED_EXTRACT": False,
                                           "_EXTRACT_X": True}),
}
DEFAULT_LADDER = ["perstage_rolled_t", "perstage_rowmajor_rolled",
                  "onelaunch_rolled_t"]


def _child(name: str):
    one_launch, flags = VARIANTS[name]
    from flowcompare_tpu.compile_cache import enable_compile_cache
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import dgcnn
    from flowcompare_tpu.ops import edgeconv_pallas

    dgcnn._ONE_LAUNCH = one_launch
    for k, v in flags.items():
        assert hasattr(edgeconv_pallas, k), k
        setattr(edgeconv_pallas, k, v)

    cfg = fc.get_config("dulcet-universe")
    salt = int(time.time() * 1e3) % (2 ** 31)
    key = jax.random.fold_in(jax.random.PRNGKey(7), salt)
    from flowcompare_tpu.encoders.dgcnn import apply_dgcnn, init_dgcnn
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

    t0 = time.time()
    out = enc(params, state, x)
    ok = bool(jnp.isfinite(out).all())
    print(json.dumps({"variant": name, "ok": ok,
                      "compile_s": round(time.time() - t0, 1)}), flush=True)


def main(names):
    results = []
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f)
        except ValueError:
            results = []
    for name in names:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", name],
                timeout=CHILD_TIMEOUT_S, capture_output=True, text=True)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("{")]
            if p.returncode == 0 and line:
                rec = json.loads(line[-1])
            else:
                err = (p.stderr or "")[-400:]
                rec = {"variant": name, "ok": False,
                       "error": ("SIGKILL" if "SIGKILL" in err else
                                 err.strip().splitlines()[-1] if err.strip()
                                 else f"rc={p.returncode}"),
                       "compile_s": round(time.time() - t0, 1)}
        except subprocess.TimeoutExpired:
            rec = {"variant": name, "ok": False, "error": "timeout/hang",
                   "compile_s": CHILD_TIMEOUT_S}
        rec["at"] = time.strftime("%Y-%m-%d %H:%M")
        print(json.dumps(rec), flush=True)
        results.append(rec)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
        # stop early once a one-launch variant compiles — that's the prize
        if rec.get("ok") and name.startswith("onelaunch"):
            break


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--child":
        _child(sys.argv[2])
    else:
        main(sys.argv[1:] or DEFAULT_LADDER)
