"""CPU simulation: full-depth nats drift if flow-kernel matmuls ran int8.

Before investing in an int8 Pallas path (v5e MXU runs s8 at 2x bf16 rate),
this measures what dynamic per-row activation / per-column weight int8
quantization would do to the 116-layer eval nats vs the f32 scan — the
README parity budget is 0.01 nats. Integer products are simulated exactly
in f32 (|q|<=127, accumulations < 2^24).

Modes: bf16 (baseline), int8_hidden (the two 512x512 coupling matmuls),
int8_mlp (+ pre-MLP, coupling in/out), int8_all (+ LU, wq).

    JAX_PLATFORMS=cpu python tools/int8_sim_cpu.py [n_layers] [batch]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

LOG2E = 1.4426950408889634


def qdot(h, w):
    """int8 dot with per-row act / per-col weight scales, simulated in f32."""
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0 + 1e-30
    sh = jnp.max(jnp.abs(hf), axis=-1, keepdims=True) / 127.0 + 1e-30
    hq = jnp.round(hf / sh)
    wq = jnp.round(wf / sw)
    return (hq @ wq) * sh * sw


def bdot(h, w):
    return jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def fdot(h, w):
    return jnp.dot(h.astype(jnp.float32), w.astype(jnp.float32))


def run_stack(arrs, n_cpl, x, ctx, extra, *, dot_mlp, dot_hidden, dot_lu,
              dot_q, split, gelu):
    """Folded layer math (mirrors flow_layer_vjp_pallas._layer_fwd_math)
    with per-matmul-class dot functions."""
    L = arrs["lu_ldj_f"].shape[0]
    has_attn = arrs.get("pre") is not None
    ldj = jnp.zeros(x.shape[:-1], jnp.float32)

    def layer(l, x):
        def row(a):
            return a[l]

        def mlp_rest(h, pairs, n_total, dot_h):
            residual = h
            for k in range(n_total - 2):
                w, b = pairs[k]
                y = dot_h(h, row(w)) + row(b).reshape(1, 1, -1)
                if k % 2 == 0:
                    residual = h
                    h = gelu(y)
                else:
                    h = gelu(residual.astype(jnp.float32) + y)
            w, b = pairs[n_total - 2]
            return dot_h(h, row(w)) + row(b).reshape(1, 1, -1)

        x1, x2 = x[..., :split], x[..., split:]
        x1e = (jnp.concatenate([x1, extra], -1) if extra is not None else x1)
        if has_attn:
            w0, b0 = arrs["pre"][0]
            h = gelu(dot_mlp(x1, row(w0)) + row(b0).reshape(1, 1, -1))
            q_in = mlp_rest(h, arrs["pre"][1:], len(arrs["pre"]), dot_mlp)
            mean = jnp.mean(q_in, -1, keepdims=True)
            var = jnp.mean(q_in * q_in, -1, keepdims=True) - mean * mean
            qn = (q_in - mean) * jax.lax.rsqrt(var + 1e-5)
            q = dot_q(qn, row(arrs["wq_f"])) + row(arrs["bq_f"]).reshape(1, 1, -1)
            kv = bdot(ctx, row(arrs["wkv"]))
            d = q.shape[-1]
            k_, v_ = kv[..., :d], kv[..., d:]
            s = jnp.einsum("bnd,bmd->bnm", q.astype(jnp.bfloat16),
                           k_.astype(jnp.bfloat16)).astype(jnp.float32)
            e = jnp.exp(s - jnp.max(s, -1, keepdims=True))
            a = jnp.einsum("bnm,bmd->bnd", e.astype(jnp.bfloat16),
                           v_.astype(jnp.bfloat16)).astype(jnp.float32)
            cond = a / jnp.sum(e, -1, keepdims=True)
        else:
            cond = ctx
        acc = dot_mlp(x1e, row(arrs["cpl_in_xe"]))
        acc = acc + dot_mlp(cond, row(arrs["cpl_in_c"]))
        h = gelu(acc + row(arrs["cpl_in_b"]).reshape(1, 1, -1))
        st = mlp_rest(h, arrs["cpl_rest"], n_cpl, dot_hidden)
        x2s = st.shape[-1] // 2
        sc = (2.0 * jax.nn.sigmoid(st[..., :x2s]) - 1.0) * (1 - 1e-8) + 1.0
        y2 = x2 * sc + st[..., x2s:]
        y = jnp.concatenate([x1, y2], -1)
        z = dot_lu(y, jnp.transpose(row(arrs["lu_w_f"])))
        z = z + row(arrs["lu_b"]).reshape(1, 1, -1)
        return z, (jnp.sum(jnp.log(sc), -1) + row(arrs["lu_ldj_f"]).reshape(()))

    for l in range(L):
        x, dl = layer(l, x)
        ldj = ldj + dl
    lp = ldj + jnp.sum(-0.5 * x * x - 0.5 * jnp.log(2 * jnp.pi), -1)
    return float(jnp.mean(lp))


def main():
    import flowcompare_tpu as fc
    from flowcompare_tpu.core.mlp import gelu
    from flowcompare_tpu.ops.flow_layer_pallas import (
        append_final_block, build_layer_stacks, fold_stacks)

    n_layers = int(sys.argv[1]) if len(sys.argv) > 1 else 115
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cfg = fc.get_config("dulcet-universe")
    cfg["n_flow_layers"] = n_layers
    model = fc.FlowCompareModel(cfg)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    layers = model._prepare_layers(params["layers"])
    stacks = append_final_block(build_layer_stacks(model, layers),
                                params["final_block"], model.latent_dim)
    folded = fold_stacks(stacks, split=model.latent_dim // 2, extra_dim=1)
    n_cpl = folded.pop("n_cpl")

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    N = cfg["sample_size"]
    x = jax.random.normal(k1, (B, N, model.latent_dim), jnp.float32)
    ctx = jax.random.normal(k2, (B, cfg["n_samples_context"],
                                 cfg["input_embedding_dim"])) * 0.5
    extra = jax.random.normal(k3, (B, N, 1))

    common = dict(split=model.latent_dim // 2, gelu=gelu)

    lp_f32 = run_stack(folded, n_cpl, x, ctx, extra, dot_mlp=fdot,
                       dot_hidden=fdot, dot_lu=fdot, dot_q=fdot, **common)
    modes = {
        "bf16": dict(dot_mlp=bdot, dot_hidden=bdot, dot_lu=bdot, dot_q=bdot),
        "int8_hidden": dict(dot_mlp=bdot, dot_hidden=qdot, dot_lu=bdot,
                            dot_q=bdot),
        "int8_mlp": dict(dot_mlp=qdot, dot_hidden=qdot, dot_lu=bdot,
                         dot_q=bdot),
        "int8_all": dict(dot_mlp=qdot, dot_hidden=qdot, dot_lu=qdot,
                         dot_q=qdot),
    }
    out = {"n_layers": n_layers, "batch": B, "lp_f32": lp_f32}
    for name, dots in modes.items():
        lp = run_stack(folded, n_cpl, x, ctx, extra, **dots, **common)
        out[name + "_nats_delta"] = round(abs(lp - lp_f32) * LOG2E / 6.0, 6)
    print(json.dumps(out, indent=1))
    os.makedirs("save/bench", exist_ok=True)
    with open("save/bench/int8_sim.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
