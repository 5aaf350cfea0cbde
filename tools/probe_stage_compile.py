"""Compile-health canary for the PER-STAGE edge-conv kernels.

The one-launch encoder megakernel is the proven compile-helper killer on a
degraded host (probe_encoder_compile.py); the per-stage kernels are four
much smaller Mosaic programs. This probe jits stage 1 on one batch item —
if it compiles while the one-launch canary fails, the bench ladder's
"stages" rung is viable on that host. Exit 0 = healthy.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.encoders.dgcnn import (_fused_edge_stage,
                                                init_dgcnn)

    cfg = fc.get_config("dulcet-universe")
    key = jax.random.fold_in(jax.random.PRNGKey(5),
                             int(time.time() * 1e3) % (2 ** 31))
    params, state = init_dgcnn(
        jax.random.PRNGKey(0), input_dim=6,
        emb_dim=cfg["input_embedding_dim"],
        out_mlp_dims=cfg["hidden_dims_embedder_out"])
    x = jax.random.normal(key, (1, cfg["n_samples_context"], 6),
                          jnp.bfloat16)

    @jax.jit
    def stage1(params, state, x):
        return _fused_edge_stage(params["conv1"], state["bn1"], x,
                                 cfg["n_neighbors"])

    t0 = time.time()
    out = stage1(params, state, x)
    print(f"per-stage edge-conv kernel compiled+ran in "
          f"{time.time() - t0:.1f}s, out {out.shape} "
          f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}")


if __name__ == "__main__":
    main()
