"""On-chip check: fused_flow_layers_trainable grads vs folded_scan_core
autodiff (both bf16-mixed). Small depth for fast compiles; real widths.

    PYTHONPATH=/root/.axon_site python tools/test_vjp_kernel_chip.py [L]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def rel(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-12))


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import flow_layer_pallas as flp
    from flowcompare_tpu.ops import flow_layer_vjp_pallas as fvp
    from flowcompare_tpu.core.mlp import gelu

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    cfg = fc.get_config("dulcet-universe")
    cfg["n_flow_layers"] = n_layers
    cfg["compute_dtype"] = "bfloat16"
    model = fc.FlowCompareModel(cfg, remat=False, fused_layers=True)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    B, N, NC = 2, 1024, cfg["n_samples_context"]
    LAT, E = cfg["latent_dim"], cfg["input_embedding_dim"]

    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (B, N, LAT), jnp.float32)
    ldj = jnp.zeros((B, N), jnp.float32)
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, NC, E)) * 0.5
    extra = jax.random.normal(jax.random.fold_in(k, 2), (B, N, 1))

    @jax.jit
    def make_arrs(params):
        layers = model._prepare_layers(params["layers"])
        stacks = flp.build_layer_stacks(model, layers)
        stacks = flp.append_final_block(stacks, params["final_block"], LAT)
        folded = flp.fold_stacks(stacks, split=LAT // 2, extra_dim=1)
        return {kk: v for kk, v in folded.items() if kk != "n_cpl"}, \
            folded["n_cpl"]

    arrs, n_cpl = make_arrs(params)
    n_cpl = int(n_cpl)  # jit made it a device scalar; the kernel needs a
    # static python int (layer-count of the coupling MLP)

    def loss_fused(x, ldj, ctx, extra, arrs):
        z, l = fvp.fused_flow_layers_trainable(
            x, ldj, ctx, extra, {**arrs, "n_cpl": n_cpl})
        return jnp.sum(z * z) * 1e-3 + jnp.sum(l) * 1e-3

    def loss_scan(x, ldj, ctx, extra, arrs):
        z, l = flp.folded_scan_core(
            x, ldj, ctx, extra, {**arrs, "n_cpl": n_cpl},
            nonlin=gelu, dtype=jnp.bfloat16, remat=False)
        return jnp.sum(z * z) * 1e-3 + jnp.sum(l) * 1e-3

    gf = jax.jit(jax.value_and_grad(loss_fused, argnums=(0, 2, 3, 4)))
    gs = jax.jit(jax.value_and_grad(loss_scan, argnums=(0, 2, 3, 4)))

    vf, (dxf, dcf, def_, daf) = gf(x, ldj, ctx, extra, arrs)
    vs, (dxs, dcs, des, das) = gs(x, ldj, ctx, extra, arrs)
    out = {
        "loss_rel": rel(vf, vs),
        "dx_rel": rel(dxf, dxs),
        "dctx_rel": rel(dcf, dcs),
        "dextra_rel": rel(def_, des),
    }
    leaves_f, td = jax.tree_util.tree_flatten(daf)
    leaves_s, _ = jax.tree_util.tree_flatten(das)
    worst = 0.0
    for lf, ls in zip(leaves_f, leaves_s):
        worst = max(worst, rel(lf, ls))
    out["dparams_worst_rel"] = worst
    out["n_param_leaves"] = len(leaves_f)
    out["n_layers"] = n_layers + 1  # + appended final block
    print(json.dumps(out, indent=1))
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "save",
                             "bench"), exist_ok=True)
    with open(os.path.join(os.path.dirname(__file__), "..", "save", "bench",
                           "vjp_parity.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
