"""Canary: plain gather-VJP (scatter-add) gradient norm on this backend.

grad_x of sum(take_along_axis(x, idx) * w) is a scatter-add of w into x's
rows; expected norm ~sqrt(B*N*K*C). The ISOLATED op is correct on the axon
TPU (measured 3580.6 vs expected 3578, 2026-08-17) — the backend bug that
killed DGCNN training gradients lives in XLA's fusion of the CHAINED
multi-stage backward (see CLAUDE.md), not in scatter itself. This canary
distinguishes the two failure modes across runtime updates.

    PYTHONPATH=/root/.axon_site python tools/scatter_grad_repro.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, N, K, C = 4, 1250, 40, 64


def grad_norm():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (B, N, C), jnp.bfloat16)
    idx = jax.random.randint(k2, (B, N, K), 0, N)
    w = jax.random.normal(k3, (B, N, K, C), jnp.bfloat16)

    @jax.jit
    def loss(x):
        g = jnp.take_along_axis(x[:, :, None, :],
                                idx[..., None], axis=1)  # (B, N, K, C)
        return jnp.sum(g.astype(jnp.float32) * w.astype(jnp.float32))

    return float(jnp.linalg.norm(
        jax.grad(loss)(x).astype(jnp.float32)))


def main():
    out = {"backend": jax.default_backend(),
           "grad_norm": grad_norm(),
           # analytic expectation: each of B*N*K unit-variance bf16 w values
           # lands somewhere; E||g||^2 ~ B*N*K*C -> norm ~ sqrt(B*N*K*C)
           "expected_order": round(float(np.sqrt(B * N * K * C)), 1)}
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    path = "save/bench/scatter_grad_repro_%s.json" % out["backend"]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
