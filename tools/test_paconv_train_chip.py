"""On-chip check of PAConv training gradients via the scatter-free matmul
gather backward (ops/knn.gather_neighbors_mm) vs the gather formulation
computed ON CPU (f32 XLA — the trustworthy reference).

Background: the hosted TPU backend silently miscompiles chained
multi-stage backwards containing scatters (CLAUDE.md). The PAConv
training path used to ride autodiff's scatter-add gather backwards —
the at-risk pattern. encoders/paconv.py now routes every train-path
gather through gather_neighbors_mm (one-hot MXU matmul backward, no
scatters anywhere in the chain); this tool measures whether that makes
the chip gradients match CPU ground truth, the same way
tools/test_edgeconv_train_chip.py validated the fused EdgeConv kernel.

    PYTHONPATH=/root/.axon_site python tools/test_paconv_train_chip.py [L]

Writes save/bench/paconv_train_parity.json with the per-run losses, the
global norm-relative gradient error over the embedder tree, and the worst
per-leaf error. NOTE the comparison is chip-bf16 vs CPU-bf16 across the
same formulation, so expect a nonzero floor from MXU-vs-CPU arithmetic
(the EdgeConv control measured ~0.6% formulation floor and a few e-3
loss_rel chip floor — see edgeconv_train_parity*.json); what this tool
must rule out is the catastrophic ~1e-3x/NaN corruption of the broken
scatter path.
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# FLOWCOMPARE_PACONV_PRECISION=f32: the on-chip HIGHEST-precision control
# (VERDICT r4 item 5). Runs the SAME formulation at f32 compute with
# jax_default_matmul_precision=highest (bf16x3 passes ~ f32 on the MXU);
# if the bf16 run's ~0.3 global_rel is the MXU-vs-CPU bf16 conditioning
# floor (as the EdgeConv CPU control argues) and not a kernel bug, this
# control must collapse toward the CPU control's ~0.6%.
_PRECISION = os.environ.get("FLOWCOMPARE_PACONV_PRECISION", "bf16")


def _npz(tag, n_layers):
    return "/tmp/paconv_%s_grads_L%d_%s.npz" % (tag, n_layers, _PRECISION)


def compute(n_layers, out_npz):
    import jax
    if os.environ.get("FLOWCOMPARE_CPU_REF"):
        jax.config.update("jax_platforms", "cpu")
    if _PRECISION == "f32":
        jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import flowcompare_tpu as fc

    cfg = fc.get_config("summer-terrain")  # PAConv, no extra context
    cfg["n_flow_layers"] = n_layers
    cfg["compute_dtype"] = None if _PRECISION == "f32" else "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=False)
    params, state = model.init_params(jax.random.PRNGKey(0))
    # B=20: CLAUDE.md's "prefer proven shapes" — a B=4 run of this very
    # tool (2026-08-17) hung >9 min and left the worker dead, consistent
    # with the recorded B=4-training-grads crash shape. Do NOT shrink B
    # to make the run cheaper.
    B = 20
    seed = int(os.environ.get("FLOWCOMPARE_SEED", "1"))
    k0, k1, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    batch = (jax.random.normal(k0, (B, cfg["n_samples_context"], 6)),
             jax.random.normal(k1, (B, cfg["sample_size"], 6)),
             None)

    @jax.jit
    def loss_grad(p):
        def loss(pp):
            l, _, _, _ = fc.inner_loop(model, pp, state, batch, rng=k3,
                                       training=True)
            return l
        return jax.value_and_grad(loss)(p)

    v, g = loss_grad(params)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(g["embedder"])[0]:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf, np.float32)
    flat["__loss__"] = np.float32(v)
    np.savez(out_npz, **flat)
    return flat


def main():
    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    if os.environ.get("FLOWCOMPARE_CPU_REF"):
        compute(n_layers, os.environ["FLOWCOMPARE_OUT"])
        return

    chip_npz = _npz("chip", n_layers)
    if not os.path.exists(chip_npz):
        compute(n_layers, chip_npz)
    chip = dict(np.load(chip_npz))
    print("chip grads done; computing CPU reference ...", file=sys.stderr,
          flush=True)
    ref_npz = _npz("cpu", n_layers)
    if not os.path.exists(ref_npz):
        env = dict(os.environ, FLOWCOMPARE_CPU_REF="1",
                   FLOWCOMPARE_OUT=ref_npz, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(n_layers)], env=env, check=True)
    ref = dict(np.load(ref_npz))

    worst, worst_name, sq_d, sq_r = 0.0, None, 0.0, 0.0
    for name, a in ref.items():
        if name == "__loss__":
            continue
        d = float(np.linalg.norm(chip[name] - a))
        na = float(np.linalg.norm(a))
        sq_d += d * d
        sq_r += na * na
        r = d / (na + 1e-12)
        if r > worst:
            worst, worst_name = r, name
    out = {
        "n_layers": n_layers,
        "precision": _PRECISION,
        "loss_chip": float(chip["__loss__"]),
        "loss_cpu": float(ref["__loss__"]),
        "loss_rel": abs(float(chip["__loss__"]) - float(ref["__loss__"]))
        / abs(float(ref["__loss__"])),
        "grad_embedder_global_rel": round((sq_d / sq_r) ** 0.5, 5),
        "grad_embedder_worst_rel": round(worst, 5),
        "grad_embedder_worst_path": worst_name,
    }
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    artifact = ("save/bench/paconv_train_parity.json" if _PRECISION == "bf16"
                else "save/bench/paconv_train_parity_%s.json" % _PRECISION)
    with open(artifact, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
