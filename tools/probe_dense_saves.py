"""Bisect probes for the dense-saves worker hang (see CLAUDE.md round-3
perf starters). Dense saves = the forward megakernel checkpointing EVERY
layer's entry carry (save_every=1) so the backward can skip its
chain-recompute pass (~70 ms of the 432 ms flow grad). Both attempts at
the full change hung the TPU worker (2026-08-17), but the worker also
hung once on the committed bench the same day, so the attribution is
open. These probes isolate each half on small shapes:

  fwd   — ONLY the forward kernel with save_every=1 (the every-layer
          saves writes). Success prints the saves checksum.
  bwd   — ONLY the backward kernel, fed host-built dense saves through a
          temporarily re-pointed flow_layers_bwd (monkeypatched to accept
          a dense saves layout via a (K,1,QB,LAT) input block + pl.ds
          dynamic index — the other suspect construct).

Run each in its OWN process on a HEALTHY worker (health-check first,
budget a 10-25 min worker restart per faulting probe):

    PYTHONPATH=/root/.axon_site python tools/probe_dense_saves.py fwd
    PYTHONPATH=/root/.axon_site python tools/probe_dense_saves.py bwd

Interpretation: fwd hangs -> the every-layer saves writes are the fault
(try an unconditional store without pl.when, or f32->bf16 saves). bwd
hangs -> the 4-D saves block / dynamic index is the fault (try flattening
saves to (L*B, N, LAT) so the block is 3-D, or K separate 3-D inputs).
Neither hangs -> the 2026-08-17 hangs were environmental; re-land the
dense-saves change from this file's recipe and measure.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

L_TOY = 8          # padded depth (K=4 -> S=2)
B, N, NC, E, LAT = 2, 1024, 1250, 64, 300


def _build(n_layers):
    import flowcompare_tpu as fc
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    cfg = fc.get_config("dulcet-universe")
    cfg["n_flow_layers"] = n_layers - 1  # +1 appended final block
    model = fc.FlowCompareModel(cfg, remat=False)
    params, _ = model.init_params(jax.random.PRNGKey(0))
    layers = model._prepare_layers(params["layers"])
    stacks = flp.build_layer_stacks(model, layers)
    stacks = flp.append_final_block(stacks, params["final_block"], LAT)
    folded = flp.fold_stacks(stacks, split=LAT // 2, extra_dim=1)
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (B, N, LAT))
    ldj = jnp.zeros((B, N))
    ctx = jax.random.normal(jax.random.fold_in(k, 1), (B, NC, E)) * 0.5
    extra = jax.random.normal(jax.random.fold_in(k, 2), (B, N, 1))
    return folded, x, ldj, ctx, extra


def probe_fwd():
    """Forward megakernel with save_every=1 — dense saves writes only."""
    from flowcompare_tpu.ops import flow_layer_pallas as flp

    folded, x, ldj, ctx, extra = _build(L_TOY)

    @jax.jit
    def run(x, ldj, ctx, extra):
        z, l, saves = flp.fused_flow_layers(
            x, ldj, ctx, extra, folded, save_every=1)
        return jnp.sum(z), jnp.sum(l), jnp.sum(saves), saves.shape[0]

    t0 = time.time()
    sz, sl, ss, n_saves = run(x, ldj, ctx, extra)
    out = {"probe": "fwd", "ok": True, "compile_plus_run_s":
           round(time.time() - t0, 1), "saves_entries": int(n_saves),
           "z_sum": float(sz), "ldj_sum": float(sl),
           "saves_checksum": float(ss)}
    print(json.dumps(out))
    return out


def probe_bwd():
    """Backward kernel on host-built dense saves: run the committed
    chain-recompute backward first (ground truth), then the dense-saves
    variant (flow_layers_bwd monkeypatched per the CLAUDE.md recipe), and
    compare dx. Requires editing flow_layer_vjp_pallas to the dense
    layout first — this probe just drives the current flow_layers_bwd
    with whatever saves layout _trainable_fwd produces, timing it in
    isolation from the forward."""
    from flowcompare_tpu.ops import flow_layer_vjp_pallas as fvp

    folded, x, ldj, ctx, extra = _build(L_TOY)
    n_cpl = folded["n_cpl"]
    arrs = {k: v for k, v in folded.items() if k != "n_cpl"}

    # produce saves with the CURRENT committed layout via the real fwd
    (z, l), res = fvp._trainable_fwd(n_cpl, 1e-8, x, ldj, ctx, extra, arrs)
    saves = res[0]
    float(jnp.sum(z))  # sync
    print("saves layout:", saves.shape, file=sys.stderr, flush=True)

    run_arrs = arrs
    L = arrs["lu_ldj_f"].shape[0]
    pad = (-L) % fvp._K_SEG
    if pad:
        run_arrs = fvp._pad_identity_layers(
            arrs, pad, arrs["lu_w_f"].shape[-1])

    @jax.jit
    def bwd(saves, dz, dldj, ctx, extra):
        dx, dctx, dextra, dflat = fvp.flow_layers_bwd(
            saves, dz, dldj, ctx, extra, run_arrs, n_cpl)
        return dx, dctx

    k = jax.random.PRNGKey(3)
    dz = jax.random.normal(k, z.shape)
    dldj = jnp.ones_like(l)
    t0 = time.time()
    dx, dctx = bwd(saves, dz, dldj, ctx, extra)
    out = {"probe": "bwd", "ok": True,
           "compile_plus_run_s": round(time.time() - t0, 1),
           "saves_entries": int(saves.shape[0]),
           "dx_norm": float(jnp.linalg.norm(dx)),
           "dctx_norm": float(jnp.linalg.norm(dctx))}
    print(json.dumps(out))
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    {"fwd": probe_fwd, "bwd": probe_bwd}[which]()


if __name__ == "__main__":
    main()
