"""Which Pallas kernel blows the degraded compile host's cap?

Companion to probe_compile_health.py: that one showed pure-XLA compiles
while any config containing the one-launch encoder megakernel gets the
helper SIGKILLed. This probe isolates the flow megakernel and the
per-stage encoder kernels so bench.py's ladder can include the fastest
configuration the host will still accept.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax


def log(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders import dgcnn

    salt = int(time.time() * 1e3) % (2 ** 31)
    key = jax.random.fold_in(jax.random.PRNGKey(11), salt)

    base = fc.get_config("dulcet-universe")
    base["compute_dtype"] = "bfloat16"
    ks = jax.random.split(key, 3)
    batch = (
        jax.random.normal(ks[0], (base["batch_size"], base["n_samples_context"], 6)),
        jax.random.normal(ks[1], (base["batch_size"], base["sample_size"], 6)),
        jax.random.normal(ks[2], (base["batch_size"], 1)),
    )
    jax.block_until_ready(batch)

    stages = (
        # fused flow megakernel, XLA encoder
        ("flow_fused_only", True, False, True),
        # per-stage edge-conv kernels instead of the one-launch encoder
        ("perstage_encoder", False, True, False),
        # both, encoder per-stage
        ("flow_plus_perstage", True, True, False),
    )
    for name, fused_layers, fused_enc, one_launch in stages:
        dgcnn._ONE_LAUNCH = one_launch
        t0 = time.time()
        try:
            cfg = dict(base, fused_encoder=fused_enc)
            model = fc.FlowCompareModel(cfg, remat=False,
                                        fused_layers=fused_layers)
            params, state = model.init_params(jax.random.PRNGKey(0))

            @jax.jit
            def ev(params, state, batch):
                loss, _, nats, _ = fc.inner_loop(
                    model, params, state, batch,
                    rng=jax.random.PRNGKey(2), training=False)
                return loss, nats

            loss, nats = ev(params, state, batch)
            log(stage=name, ok=True, s=round(time.time() - t0, 1),
                loss=float(loss), nats=float(nats))
        except Exception as e:
            log(stage=name, ok=False, s=round(time.time() - t0, 1),
                err=repr(e)[:160])


if __name__ == "__main__":
    main()
