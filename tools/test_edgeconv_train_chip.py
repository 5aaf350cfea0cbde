"""On-chip check of the fused EdgeConv TRAIN kernel: loss + gradients of a
training step using the fused encoder (edgeconv_vjp_pallas, on TPU) vs the
gather formulation computed ON CPU (f32 XLA — the trustworthy reference).

Why CPU for the reference: the axon TPU backend's scatter-add backward (the
VJP of gather_neighbors / top_k gathers) silently returns ~1e-7-norm
gradients for everything upstream of a scatter — measured 2026-08-17:
chip-gather conv2.w grad norm 9.8e-7 vs 3.5e-3 on CPU and 3.5e-3 from the
fused kernel. The fused kernel (scatter-free, one-hot MXU backward) is both
the fast path and the CORRECT one on this backend.

    PYTHONPATH=/root/.axon_site python tools/test_edgeconv_train_chip.py [L]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

def _ref_npz(n_layers):
    return "/tmp/edgeconv_ref_grads_L%d.npz" % n_layers


def compute(fused_enc: bool, n_layers: int, out_npz=None):
    import jax
    if os.environ.get("FLOWCOMPARE_CPU_REF"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flowcompare_tpu as fc
    if os.environ.get("FLOWCOMPARE_FUSED_INTERPRET"):
        from flowcompare_tpu.encoders import dgcnn as _dg
        _dg._FORCE_FUSED_TRAIN_INTERPRET = True

    cfg = fc.get_config("dulcet-universe")
    cfg["n_flow_layers"] = n_layers
    cfg["compute_dtype"] = "bfloat16"
    cfg["fused_encoder"] = fused_enc
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=False)
    params, state = model.init_params(jax.random.PRNGKey(0))
    B = 20
    seed = int(os.environ.get("FLOWCOMPARE_SEED", "1"))
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 4)
    batch = (jax.random.normal(k0, (B, cfg["n_samples_context"], 6)),
             jax.random.normal(k1, (B, cfg["sample_size"], 6)),
             jax.random.normal(k2, (B, 1)))

    @jax.jit
    def loss_grad(p):
        def loss(pp):
            l, _, _, _ = fc.inner_loop(model, pp, state, batch, rng=k3,
                                       training=True)
            return l
        return jax.value_and_grad(loss)(p)

    v, g = loss_grad(params)
    emb = g["embedder"]
    flat = {}
    paths = jax.tree_util.tree_flatten_with_path(emb)[0]
    for path, leaf in paths:
        flat[jax.tree_util.keystr(path)] = np.asarray(leaf, np.float32)
    flat["__loss__"] = np.float32(v)
    if out_npz:
        np.savez(out_npz, **flat)
    return flat


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    cpu_control = "--cpu-control" in sys.argv
    n_layers = int(argv[0]) if argv else 4

    if os.environ.get("FLOWCOMPARE_CPU_REF"):
        compute(os.environ.get("FLOWCOMPARE_FUSED_INTERPRET") == "1",
                n_layers,
                out_npz=os.environ.get("FLOWCOMPARE_OUT", _ref_npz(n_layers)))
        return

    if cpu_control:
        # control experiment: fused kernel in interpret mode ON CPU vs the
        # CPU gather reference — same machine, same bf16 formulation. Any
        # gap here is formulation/precision conditioning; only the excess
        # seen on chip beyond this would be a backend effect.
        fused_npz = "/tmp/edgeconv_fusedcpu_grads_L%d.npz" % n_layers
        src = "fused_cpu_interpret"
        if not os.path.exists(fused_npz):
            env = dict(os.environ, FLOWCOMPARE_CPU_REF="1",
                       FLOWCOMPARE_FUSED_INTERPRET="1",
                       FLOWCOMPARE_OUT=fused_npz, JAX_PLATFORMS="cpu")
            subprocess.run([sys.executable, os.path.abspath(__file__),
                            str(n_layers)], env=env, check=True)
        fused = dict(np.load(fused_npz))
    else:
        src = "fused_tpu"
        fused_npz = "/tmp/edgeconv_fused_grads_L%d.npz" % n_layers
        if os.path.exists(fused_npz):
            fused = dict(np.load(fused_npz))
            print("fused (TPU) grads loaded from cache", file=sys.stderr,
                  flush=True)
        else:
            fused = compute(True, n_layers, out_npz=fused_npz)
    print("%s done; computing CPU gather reference ..." % src,
          file=sys.stderr, flush=True)
    if not os.path.exists(_ref_npz(n_layers)):
        env = dict(os.environ, FLOWCOMPARE_CPU_REF="1",
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS=os.environ.get("XLA_FLAGS", ""))
        env.pop("FLOWCOMPARE_FUSED_INTERPRET", None)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        str(n_layers)], env=env, check=True)
    ref = dict(np.load(_ref_npz(n_layers)))

    out = {"n_layers": n_layers, "fused_source": src,
           "loss_fused_tpu": float(fused["__loss__"]),
           "loss_gather_cpu": float(ref["__loss__"])}
    worst, worst_name = 0.0, None
    sq_diff, sq_ref = 0.0, 0.0
    for name, a in ref.items():
        if name == "__loss__":
            continue
        b = fused[name]
        d = float(np.linalg.norm(b - a))
        na = float(np.linalg.norm(a))
        sq_diff += d * d
        sq_ref += na * na
        r = d / (na + 1e-12)
        if r > worst:
            worst, worst_name = r, name
    out["loss_rel"] = abs(out["loss_fused_tpu"] - out["loss_gather_cpu"]) / abs(
        out["loss_gather_cpu"])
    # per-leaf worst is dominated by tiny-norm leaves (bf16 path noise on a
    # small bias); the global norm-relative error is the optimization-
    # relevant number
    out["grad_embedder_global_rel"] = round((sq_diff / sq_ref) ** 0.5, 5)
    out["grad_embedder_worst_rel"] = round(worst, 5)
    out["grad_embedder_worst_path"] = worst_name
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    name = ("edgeconv_train_parity_cpu_control.json" if cpu_control
            else "edgeconv_train_parity.json")
    with open(os.path.join("save/bench", name), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
