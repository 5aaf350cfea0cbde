"""Execute the fused-kernels-under-shard_map path on the real chip.

The 8-device CPU mesh validates the `fused_mesh` wrapper at the TRACE
level only (the megakernels can't run off-TPU). This probe runs the REAL
kernels inside shard_map on a 1-device 'data' mesh on the attached chip
and demands bit-identical log-probs vs the direct (no-mesh) fused path —
the wrapper must be a pure restructuring. Uses the XLA encoder so it runs
even on a degraded compile host (bit-exact vs the encoder kernel).

Writes save/bench/fused_mesh_chip.json. Two DIFFERENTLY-NAMED jits
(MEASUREMENT TRAP 3, CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh


def main():
    import flowcompare_tpu as fc

    cfg = fc.get_config("dulcet-universe")
    cfg["fused_encoder"] = False  # degraded-host safe; bit-exact in eval
    cfg["compute_dtype"] = "bfloat16"
    B = cfg["batch_size"]
    direct = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    meshed = direct.with_options(fused_mesh=mesh)

    params, state = direct.init_params(jax.random.PRNGKey(0))
    salt = int(time.time() * 1e3) % (2 ** 31)
    k0, k1, k2, k3 = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(21), salt), 4)
    batch = (jax.random.normal(k0, (B, cfg["n_samples_context"], 6)),
             jax.random.normal(k1, (B, cfg["sample_size"], 6)),
             jax.random.normal(k2, (B, 1)))

    @jax.jit
    def lp_direct_nomesh(params, state, batch, rng):
        return fc.inner_loop(direct, params, state, batch, rng=rng,
                             training=False)[1]

    @jax.jit
    def lp_shardmapped_mesh1(params, state, batch, rng):
        return fc.inner_loop(meshed, params, state, batch, rng=rng,
                             training=False)[1]

    a = np.asarray(lp_direct_nomesh(params, state, batch, k3))
    b = np.asarray(lp_shardmapped_mesh1(params, state, batch, k3))
    # equal_nan + finite-masked delta: identical -inf/NaN patterns must
    # count as identical, not poison the statistic (-inf - -inf = NaN —
    # MEASUREMENT TRAP 4, CLAUDE.md)
    both_finite = np.isfinite(a) & np.isfinite(b)
    out = {
        "bitwise_identical": bool(np.array_equal(a, b, equal_nan=True)),
        "max_abs_delta": (float(np.max(np.abs(a - b)[both_finite]))
                          if both_finite.any() else 0.0),
        "nonfinite": {"direct": int((~np.isfinite(a)).sum()),
                      "shardmapped": int((~np.isfinite(b)).sum())},
        "finite": bool(np.isfinite(a).all() and np.isfinite(b).all()),
        "batch": B,
        "mesh": "1-device 'data' mesh on the real chip",
        "paths": "fused flow megakernel + fused augmenter, xla encoder",
        "recorded": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(out, indent=1))
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "save", "bench")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "fused_mesh_chip.json"), "w") as f:
        json.dump(out, f, indent=1)
    assert out["finite"]
    assert out["max_abs_delta"] == 0.0, out


if __name__ == "__main__":
    main()
