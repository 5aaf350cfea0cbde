"""On-chip nats parity: fused megakernel eval vs the f32 lax.scan path at
FULL SCALE (dulcet-universe, 115 layers + final block). Writes
save/bench/kernel_nats_parity.json. Run:

    PYTHONPATH=/root/.axon_site python tools/kernel_nats_parity_chip.py [B]

Pass --transposed to run the fused path through the transposed megakernel
(_TRANSPOSED_EVAL) instead of the row-major one; writes
kernel_nats_parity_transposed.json in that case.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import flowcompare_tpu as fc

    transposed = "--transposed" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    if transposed:
        from flowcompare_tpu.ops import flow_layer_pallas as flp
        flp._TRANSPOSED_EVAL = True
    B = int(argv[0]) if argv else 4
    cfg = fc.get_config("dulcet-universe")
    base = fc.FlowCompareModel(cfg)  # f32 scan reference
    fast = base.with_options(fused_layers=True, compute_dtype="bfloat16",
                             remat=False)
    params, state = base.init_params(jax.random.PRNGKey(0))
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 4)
    batch = (jax.random.normal(k0, (B, cfg["n_samples_context"], 6)),
             jax.random.normal(k1, (B, cfg["sample_size"], 6)),
             jax.random.normal(k2, (B, 1)))

    _, lp_ref, nats_ref, _ = fc.inner_loop(base, params, state, batch, rng=k3)
    _, lp_fast, nats_fast, _ = fc.inner_loop(fast, params, state, batch,
                                             rng=k3)
    out = {
        "nats_ref_f32_scan": float(nats_ref),
        "nats_fused_bf16": float(nats_fast),
        "nats_delta": float(abs(nats_fast - nats_ref)),
        "logprob_max_abs_delta": float(jnp.max(jnp.abs(lp_fast - lp_ref))),
        "batch": B,
        "n_layers": cfg["n_flow_layers"],
        "transposed": transposed,
    }
    print(json.dumps(out, indent=1))
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "save", "bench")
    os.makedirs(outdir, exist_ok=True)
    name = ("kernel_nats_parity_transposed.json" if transposed
            else "kernel_nats_parity.json")
    with open(os.path.join(outdir, name), "w") as f:
        json.dump(out, f, indent=1)
    assert out["nats_delta"] < 0.01, out


if __name__ == "__main__":
    main()
