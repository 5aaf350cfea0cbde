"""Perf attribution for the flow-layer megakernel via trace-time ablations.

The TPU backend's profiler hangs (CLAUDE.md), so attribution is done by
re-tracing the kernel with pieces removed (flow_layer_pallas.ABLATE) and
measuring the time delta on-chip.  Also measures a pure-matmul roofline
probe (the realistic MXU ceiling for this chip/tunnel) so kernel efficiency
can be stated against a MEASURED peak rather than a datasheet number.

Writes save/bench/ablate_kernel.json. Run on the TPU:
    PYTHONPATH=/root/.axon_site python tools/ablate_kernel.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

REPS = 10   # kernel invocations per compiled dispatch (amortizes tunnel)
TIMED = 3


def _sync(x):
    return float(jnp.sum(x))


def time_fn(fn, make_args, n_warm=2, n_timed=TIMED):
    """Median-of-N timing with UNIQUE warmup inputs (tunnel memoizes)."""
    for w in range(n_warm):
        _sync(fn(*make_args(1000 + w)))
    ts = []
    for i in range(n_timed):
        a = make_args(i)
        t0 = time.perf_counter()
        _sync(fn(*a))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_kernel(ablate=frozenset()):
    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    flp.ABLATE = frozenset(ablate)
    try:
        cfg = fc.get_config("dulcet-universe")
        cfg["compute_dtype"] = "bfloat16"
        model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
        params, _ = model.init_params(jax.random.PRNGKey(0))
        B, N, NC = cfg["batch_size"], cfg["sample_size"], cfg["n_samples_context"]
        LAT, E = cfg["latent_dim"], cfg["input_embedding_dim"]

        @jax.jit
        def run(xs, ldj, ctx, extra, params):
            layers = model._prepare_layers(params["layers"])
            stacks = flp.build_layer_stacks(model, layers)
            stacks = flp.append_final_block(stacks, params["final_block"], LAT)
            folded = flp.fold_stacks(stacks, split=LAT // 2, extra_dim=1)

            def body(c, x):
                o, l = flp.fused_flow_layers(x, ldj, ctx, extra, folded)
                return c + jnp.sum(o[0, 0]) + jnp.sum(l[0]), None
            out, _ = jax.lax.scan(body, 0.0, xs)
            return out

        k = jax.random.PRNGKey(7)

        def make_args(i):
            kk = jax.random.fold_in(k, i)
            return (jax.random.normal(kk, (REPS, B, N, LAT)),
                    jnp.zeros((B, N)),
                    jax.random.normal(jax.random.fold_in(kk, 1), (B, NC, E)),
                    jax.random.normal(jax.random.fold_in(kk, 2), (B, N, 1)),
                    params)

        dt = time_fn(run, make_args) / REPS
        return dt
    finally:
        flp.ABLATE = frozenset()


def bench_matmul_roofline():
    """Measured bf16 MXU ceiling: big square matmul chain, all dims 512."""
    K = 512
    n_mm = 400
    a = jax.random.normal(jax.random.PRNGKey(0), (4096, K)).astype(jnp.bfloat16)
    ws = jax.random.normal(jax.random.PRNGKey(1), (n_mm, K, K)).astype(
        jnp.bfloat16) * 0.01

    @jax.jit
    def run(a, ws):
        def body(h, w):
            h = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
            return h, None
        h, _ = jax.lax.scan(body, a, ws)
        return jnp.sum(h.astype(jnp.float32))

    def make_args(i):
        return (a * (1.0 + i * 1e-6), ws)

    dt = time_fn(lambda a, w: run(a, w), make_args)
    flops = 2 * 4096 * K * K * n_mm
    return flops / dt / 1e12


def main():
    out = {"roofline_bf16_tflops": round(bench_matmul_roofline(), 1)}
    full = bench_kernel()
    out["full_ms"] = round(full * 1e3, 2)
    for name, ab in [
        ("nogelu", {"nogelu"}),
        ("noexp", {"noexp"}),
        ("noattn", {"noattn"}),
        ("nolu", {"nolu"}),
        ("nocpl_hidden", {"nocpl_hidden"}),
    ]:
        dt = bench_kernel(ab)
        out[name + "_ms"] = round(dt * 1e3, 2)
        out[name + "_delta_ms"] = round((full - dt) * 1e3, 2)
        print(json.dumps({name: out[name + "_ms"],
                          "delta": out[name + "_delta_ms"]}), flush=True)
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/ablate_kernel.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
