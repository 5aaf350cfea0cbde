"""Model assembly: config -> conditional normalizing flow, TPU-first.

This is the counterpart of the reference's `model_initialization.py`
(initialize_flow / inner_loop / make_sample) rebuilt for XLA:

* Parameters are one pytree; every apply function is pure.
* The 114 identical (coupling-block, ActNorm, LinearLU) layers are
  *stacked along a leading axis* and driven by `lax.scan` — one compiled
  layer body instead of ~342 dispatched modules, which is the single
  biggest structural win over a line-for-line port (constant compile time,
  no per-layer dispatch, optional `jax.checkpoint` on the body giving the
  same memory/compute trade as the reference's torch.utils.checkpoint).
* Per-point log-det-jacobians (B, N) accumulate in float32 throughout
  (numerics rule for 115-layer stacks in reduced precision).
* RNG is explicit: `log_prob` needs a key only for the augmenter's
  conditional sample; `sample` threads per-layer keys through the scan.

Architecture graph per config (matches reference model_initialization.py:30-202):
  augmenter -> n_flow_layers x [coupling_block, ActNorm?, permuter]
  (no ActNorm/permuter after the last layer) -> StandardNormal base.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .configs.presets import derive
from .core.attention import apply_cross_attention, init_cross_attention
from .core.mlp import NONLINEARITIES, apply_mlp, init_mlp
from .encoders.dgcnn import apply_dgcnn, init_dgcnn
from .encoders.paconv import apply_pointnet2_paconv, init_pointnet2_paconv
from .flows import actnorm, augment, coupling, permuters, spline
from .flows.distributions import (
    normal_sample,
    standard_normal_logprob,
)

LOG2E = math.log2(math.e)

# one-time warning latch for the fused-kernels-under-multi-device fallback
_MULTIDEVICE_FUSE_WARNED: list = []

# Testing hook: bypass the TPU-backend requirement of _can_fuse_layers so
# CPU tests can TRACE the fused paths (jax.make_jaxpr / eval_shape only —
# the kernels cannot execute off-TPU; tests/test_model.py uses this to
# validate the shard_map wrapper structure on the 8-device CPU mesh).
_FORCE_FUSE_FOR_TRACE = False


def _tree_stack(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


class FlowCompareModel:
    """Static model definition; parameters travel separately as a pytree.

    `remat` / `fused_layers` / `compute_dtype` are jit-static: compiled
    functions (eval/evaluate.py, bench.py) close over the model, so mutating
    them after a trace would silently reuse a stale executable. They are
    therefore constructor options, frozen after __init__ — use
    `with_options(...)` to get a reconfigured model.
    """

    _JIT_STATIC_FLAGS = frozenset(
        {"remat", "fused_layers", "compute_dtype", "_dt", "fused_mesh"})

    def __init__(self, config: dict, *, remat: bool = True,
                 fused_layers: bool = False, fused_mesh=None):
        config = derive(dict(config))
        self.config = config
        self.nonlin = NONLINEARITIES[config["coupling_block_nonlinearity"]]
        self.input_dim = config["input_dim"]
        self.latent_dim = config["latent_dim"]
        self.n_layers = config["n_flow_layers"]
        self.use_act_norm = bool(config["act_norm"])
        self.is_global = bool(config["global"])
        self.extra_dim = config["extra_context_dim"]
        self.flow_type = config["flow_type"]
        self.permuter_type = config["permuter_type"]
        self.remat = remat
        # eval-only fused layer megakernel (ops/flow_layer_pallas.py);
        # enabled explicitly by eval/bench paths via this option
        self.fused_layers = fused_layers
        # Multi-device contract (docs/kernels.md): the megakernels are
        # single-device programs. fused_mesh opts into running them under
        # SPMD anyway via a shard_map wrapper with BATCH-axis sharding
        # over the mesh's 'data' axis (each device runs the whole kernel
        # on its batch shard; weights replicated — the kernels are
        # embarrassingly parallel over items). Without it, multi-device
        # falls back to the folded scan.
        if fused_mesh is not None and "data" not in fused_mesh.axis_names:
            raise ValueError("fused_mesh needs a 'data' axis "
                             f"(got {fused_mesh.axis_names})")
        self.fused_mesh = fused_mesh
        # Mixed-precision policy: matmuls/activations in compute_dtype
        # (bfloat16 on TPU for MXU rate), parameters and all ldj / log-prob
        # accumulation in float32 — replaces the reference's (disabled) AMP
        # GradScaler path (train.py:88-94); bf16 needs no loss scaling.
        self.compute_dtype = jnp.dtype(config.get("compute_dtype", "float32"))
        self._dt = None if self.compute_dtype == jnp.float32 else self.compute_dtype
        if config["latent_dim"] < config["input_dim"]:
            raise ValueError("Latent dim < input dim")
        if config["cif_latent_dim"] < config["latent_dim"]:
            raise ValueError("Augment dim smaller than main latent!")
        # CIF sandwich blocks (cif_helper path, models/cif_block.py:30-46):
        # taken when the per-block latent is widened beyond the main latent
        self.is_cif = config["cif_latent_dim"] > config["latent_dim"]
        if self.is_cif and config["using_extra_context"]:
            raise ValueError("Not implemented extra context with cif")
        if self.is_cif and config["global"]:
            raise ValueError("CIF + global embedding not implemented")

        if config["latent_dim"] == config["input_dim"]:
            self.augmenter_kind = "identity"
        elif config["augmenter_dist"] == "StandardNormal":
            self.augmenter_kind = "standard_normal"
        elif config["augmenter_dist"] == "ConditionalNormal":
            self.augmenter_kind = (
                "conditional_attn" if config["use_attn_augment"] else "conditional")
        else:
            raise ValueError(f"Invalid augmenter_dist {config['augmenter_dist']}")
        self._flags_frozen = True

    def __setattr__(self, name, value):
        if name in self._JIT_STATIC_FLAGS and getattr(self, "_flags_frozen",
                                                      False):
            raise AttributeError(
                f"FlowCompareModel.{name} is jit-static: compiled functions "
                "close over the model and would silently reuse a stale "
                "executable if it changed. Pass it to the constructor or use "
                "model.with_options(...) to build a reconfigured model.")
        object.__setattr__(self, name, value)

    def with_options(self, *, remat: Optional[bool] = None,
                     fused_layers: Optional[bool] = None,
                     compute_dtype: Optional[str] = None,
                     fused_mesh="unchanged",
                     **config_overrides) -> "FlowCompareModel":
        """A new model sharing this config, with jit-static options changed."""
        cfg = dict(self.config, **config_overrides)
        if compute_dtype is not None:
            cfg["compute_dtype"] = compute_dtype
        return FlowCompareModel(
            cfg,
            remat=self.remat if remat is None else remat,
            fused_layers=(self.fused_layers if fused_layers is None
                          else fused_layers),
            fused_mesh=(self.fused_mesh if fused_mesh == "unchanged"
                        else fused_mesh))

    # ------------------------------------------------------------- builders

    def _init_attn(self, key):
        c = self.config
        return init_cross_attention(
            key, out_dim=c["attn_dim"], query_dim=c["attn_input_dim"],
            context_dim=c["input_embedding_dim"], heads=c["cross_heads"],
            dim_head=c["cross_dim_head"])

    def _coupling_context_dim(self) -> int:
        c = self.config
        if self.is_global:
            return c["input_embedding_dim"] + self.extra_dim
        return c["attn_dim"] + self.extra_dim

    def _init_coupling(self, key):
        c = self.config
        ctx = self._coupling_context_dim()
        if self.flow_type == "AffineCoupling":
            return coupling.init_affine_coupling(
                key, self.latent_dim, c["hidden_dims"], context_dim=ctx)
        if self.flow_type == "ExponentialCoupling":
            return coupling.init_exponential_coupling(
                key, self.latent_dim, c["hidden_dims"], context_dim=ctx)
        if self.flow_type == "RationalQuadraticSplineCoupling":
            return spline.init_spline_coupling(
                key, self.latent_dim, c["hidden_dims"],
                num_bins=c["num_bins_spline"], context_dim=ctx)
        raise ValueError(f"Invalid flow type {self.flow_type}")

    def _init_block(self, key):
        c = self.config
        if self.is_global:
            return {"coupling": self._init_coupling(key)}
        k_mlp, k_attn, k_cpl, k_cif, k_acif = jax.random.split(key, 5)
        block = {
            "pre_attention_mlp": init_mlp(
                k_mlp, self.latent_dim // 2, c["pre_attention_mlp_hidden_dims"],
                c["attn_input_dim"]),
            "attn": self._init_attn(k_attn),
            "coupling": self._init_coupling(k_cpl),
        }
        if self.is_cif:
            cif_lat = c["cif_latent_dim"]
            # one ConditionalNormal net SHARED by the block's augment and
            # slice (the reference reuses distrib_augment, cif_block.py:60-67)
            block["cif_net"] = init_mlp(
                k_cif, self.latent_dim, c["net_cif_dist_hidden_dims"],
                (cif_lat - self.latent_dim) * 2)
            block["affine_cif"] = coupling.init_affine_coupling(
                k_acif, cif_lat, c["affine_cif_hidden"],
                split_dim=cif_lat - self.latent_dim)
            block["cif_actnorm"] = actnorm.init_actnorm(cif_lat)
        return block

    def _init_permuter(self, key):
        d = self.latent_dim
        if self.permuter_type == "LinearLU":
            return permuters.init_linear_lu(d, eps=self.config["linear_lu_eps"])
        if self.permuter_type == "random_permute":
            return permuters.init_permuter(key, d)
        if self.permuter_type == "FullCombiner":
            return permuters.init_full_combiner(key, d)
        if self.permuter_type == "ExponentialCombiner":
            return permuters.init_exponential_combiner(key, d)
        raise ValueError(f"Invalid permuter type: {self.permuter_type}")

    def _init_augmenter(self, key):
        c = self.config
        aug_out = (self.latent_dim - self.input_dim) * 2
        if self.augmenter_kind in ("identity", "standard_normal"):
            return {}
        if self.augmenter_kind == "conditional_attn":
            k1, k2, k3 = jax.random.split(key, 3)
            return {
                "pre_attn_mlp": init_mlp(
                    k1, self.input_dim, c["hidden_dims"], c["attn_input_dim"]),
                "attn": self._init_attn(k2),
                "augment": {"net": init_mlp(
                    k3, c["attn_dim"] + self.input_dim + self.extra_dim,
                    c["net_augmenter_dist_hidden_dims"], aug_out)},
            }
        return {"augment": {"net": init_mlp(
            key, self.input_dim, c["net_augmenter_dist_hidden_dims"], aug_out)}}

    def init_params(self, key: jax.Array):
        """Returns (params, state). state carries encoder BatchNorm stats."""
        c = self.config
        k_emb, k_aug, k_final, *k_layers = jax.random.split(key, 3 + self.n_layers - 1)
        state: dict[str, Any] = {}
        if c["input_embedder"] == "DGCNNembedder":
            emb, emb_state = init_dgcnn(
                k_emb, input_dim=self.input_dim, emb_dim=c["input_embedding_dim"],
                out_mlp_dims=c["hidden_dims_embedder_out"],
                n_neighbors=c["n_neighbors"], global_pool=False)
            state["embedder"] = emb_state
        elif c["input_embedder"] == "DGCNNembedderGlobal":
            emb, emb_state = init_dgcnn(
                k_emb, input_dim=self.input_dim, emb_dim=c["input_embedding_dim"],
                out_mlp_dims=c["hidden_dims_embedder_out"],
                n_neighbors=c["n_neighbors"], global_pool=True)
            state["embedder"] = emb_state
        elif c["input_embedder"] == "PAConv":
            emb, emb_state = init_pointnet2_paconv(
                k_emb, c=self.input_dim - 3, k=c["input_embedding_dim"],
                out_mlp_dims=c["hidden_dims_embedder_out"])
            state["embedder"] = emb_state
        elif c["input_embedder"] == "idenity":  # sic — reference key
            emb, state["embedder"] = {}, {}
        else:
            raise ValueError(f"Invalid input embedder {c['input_embedder']}")

        layer_params = []
        for kl in k_layers:
            kb, kp = jax.random.split(kl)
            lp = {"block": self._init_block(kb),
                  "permuter": self._init_permuter(kp)}
            if self.use_act_norm:
                lp["actnorm"] = actnorm.init_actnorm(self.latent_dim)
            layer_params.append(lp)

        params = {
            "embedder": emb,
            "augmenter": self._init_augmenter(k_aug),
            "layers": _tree_stack(layer_params),
            "final_block": self._init_block(k_final),
        }
        return params, state

    # ------------------------------------------------------------ embedder

    def embed(self, params, state, extract_0, *, training: bool = False,
              prefer_xla: bool = False):
        """extract_0 (B, Nc, input_dim) -> per-point (B, Nc, E) or global (B, E).

        prefer_xla: take the XLA gather formulation even where the Pallas
        kernels are eligible — bit-exact for EVAL (docs/kernels.md) and
        used by one-shot non-hot calls (ActNorm data-init) so they don't
        depend on the encoder kernels compiling (the remote compile helper
        is known to reject exactly those in its degraded state, CLAUDE.md).
        Never set it for TRAINING on the axon TPU backend — the gather
        formulation's chained backward is miscompiled there."""
        c = self.config
        kind = c["input_embedder"]
        if kind == "idenity":
            return extract_0, state
        if kind in ("DGCNNembedder", "DGCNNembedderGlobal"):
            # fused also when TRAINING in f32: on the axon TPU backend the
            # gather formulation's chained backward is silently miscompiled
            # (CLAUDE.md), so every TPU training run must go through the
            # scatter-free kernel path — apply_dgcnn itself falls back to
            # gather on non-TPU backends where autodiff is trustworthy.
            out, new_emb_state = apply_dgcnn(
                params["embedder"], state["embedder"], extract_0,
                n_neighbors=c["n_neighbors"], training=training,
                global_pool=self.is_global, dtype=self._dt,
                fused=(self._dt is not None or training)
                and c.get("fused_encoder", True)
                and not (prefer_xla and not training))
        else:
            out, new_emb_state = apply_pointnet2_paconv(
                params["embedder"], state["embedder"], extract_0,
                training=training,
                # bf16 eval policy (geometry stays f32 inside); the
                # training path keeps the chip-validated f32 formulation
                dtype=(None if training else self._dt))
        return out, {**state, "embedder": new_emb_state}

    # ----------------------------------------------------------- transforms

    def _coupling_fwd(self, p, x, ctx):
        if self.flow_type == "AffineCoupling":
            return coupling.affine_coupling_forward(
                p, x, ctx, nonlin=self.nonlin,
                scale_fn_type=self.config["affine_scale_fn"], dtype=self._dt)
        if self.flow_type == "ExponentialCoupling":
            return coupling.exponential_coupling_forward(p, x, ctx, nonlin=self.nonlin)
        return spline.spline_coupling_forward(
            p, x, ctx, nonlin=self.nonlin, num_bins=self.config["num_bins_spline"])

    def _coupling_inv(self, p, y, ctx):
        if self.flow_type == "AffineCoupling":
            return coupling.affine_coupling_inverse(
                p, y, ctx, nonlin=self.nonlin,
                scale_fn_type=self.config["affine_scale_fn"], dtype=self._dt)
        if self.flow_type == "ExponentialCoupling":
            return coupling.exponential_coupling_inverse(p, y, ctx, nonlin=self.nonlin)
        return spline.spline_coupling_inverse(
            p, y, ctx, nonlin=self.nonlin, num_bins=self.config["num_bins_spline"])

    def _block_context(self, p, x, context, extra_context):
        """PreConditionApplier semantics (models/transform.py:39-58)."""
        if self.is_global:
            ctx = context
        else:
            x1 = x[..., : self.latent_dim // 2]
            mlp_out = apply_mlp(p["pre_attention_mlp"], x1, self.nonlin,
                                dtype=self._dt)
            ctx = apply_cross_attention(p["attn"], mlp_out, context,
                                        dtype=self._dt)
            # named so the remat policy can keep it: saving just the attention
            # embedding (~31 MB/layer bf16) lets the backward skip
            # recomputing the pre-MLP + attention chain
            from jax.ad_checkpoint import checkpoint_name
            ctx = checkpoint_name(ctx, "attn_emb")
        if extra_context is not None:
            ctx = jnp.concatenate((extra_context, ctx), axis=-1)
        return ctx

    def _block_fwd(self, p, x, context, extra_context, rng=None):
        if self.is_cif:
            return self._cif_block_fwd(p, x, context, rng)[:2]
        ctx = self._block_context(p, x, context, extra_context)
        return self._coupling_fwd(p["coupling"], x, ctx)

    def _block_inv(self, p, y, context, extra_context, rng=None):
        if self.is_cif:
            return self._cif_block_inv(p, y, context, rng)
        ctx = self._block_context(p, y, context, extra_context)
        return self._coupling_inv(p["coupling"], y, ctx)

    def _cif_block_fwd(self, p, x, context, rng, init_actnorm=False):
        """CIFblock.forward (models/cif_block.py:69-97): augment -> reverse
        -> affine -> actnorm -> reverse -> slice -> conditioned coupling."""
        c = self.config
        clamp = c["clamp_dist"]
        x, ldj = augment.augment_conditional_forward(
            {"net": p["cif_net"]}, rng, x, None, nonlin=self.nonlin,
            clamp=clamp, dtype=self._dt)
        x = x[..., ::-1]
        x, l2 = coupling.affine_coupling_forward(
            p["affine_cif"], x, None, nonlin=self.nonlin,
            scale_fn_type="sigmoid",
            split_dim=c["cif_latent_dim"] - self.latent_dim, dtype=self._dt)
        an = actnorm.actnorm_data_init(x) if init_actnorm else p["cif_actnorm"]
        x, l3 = actnorm.actnorm_forward(an, x)
        x = x[..., ::-1]
        x, l4 = augment.slice_forward(
            {"net": p["cif_net"]}, x, None, num_keep=self.latent_dim,
            nonlin=self.nonlin, clamp=clamp)
        ctx = self._block_context(p, x, context, None)
        x, l5 = self._coupling_fwd(p["coupling"], x, ctx)
        total = ldj + l2 + l3 + l4 + l5
        return (x, total, an) if init_actnorm else (x, total)

    def _cif_block_inv(self, p, y, context, rng):
        """CIFblock.inverse (models/cif_block.py:99-109)."""
        c = self.config
        clamp = c["clamp_dist"]
        ctx = self._block_context(p, y, context, None)
        y = self._coupling_inv(p["coupling"], y, ctx)
        y = augment.slice_inverse({"net": p["cif_net"]}, rng, y, None,
                                  nonlin=self.nonlin, clamp=clamp)
        y = y[..., ::-1]
        y = actnorm.actnorm_inverse(p["cif_actnorm"], y)
        y = coupling.affine_coupling_inverse(
            p["affine_cif"], y, None, nonlin=self.nonlin,
            scale_fn_type="sigmoid",
            split_dim=c["cif_latent_dim"] - self.latent_dim, dtype=self._dt)
        y = y[..., ::-1]
        return y[..., : self.latent_dim]

    def _permuter_fwd(self, p, x):
        t = self.permuter_type
        if t == "LinearLU":
            return permuters.linear_lu_forward(
                p, x, eps=self.config["linear_lu_eps"], dtype=self._dt)
        if t == "random_permute":
            return permuters.permuter_forward(p, x)
        if t == "FullCombiner":
            return permuters.full_combiner_forward(p, x)
        return permuters.exponential_combiner_forward(p, x)

    def _permuter_inv(self, p, y):
        t = self.permuter_type
        if t == "LinearLU":
            return permuters.linear_lu_inverse(p, y, eps=self.config["linear_lu_eps"])
        if t == "random_permute":
            return permuters.permuter_inverse(p, y)
        if t == "FullCombiner":
            return permuters.full_combiner_inverse(p, y)
        return permuters.exponential_combiner_inverse(p, y)

    def _augment_fwd(self, p, rng, x, context, extra_context):
        kind = self.augmenter_kind
        if kind == "identity":
            return x, jnp.zeros(x.shape[:-1], jnp.float32)
        if kind == "standard_normal":
            return augment.augment_standard_normal_forward(
                rng, x, aug_dim=self.latent_dim - self.input_dim)
        if kind == "conditional_attn":
            return augment.augment_attn_forward(
                p, rng, x, context, extra_context, nonlin=self.nonlin,
                dtype=self._dt)
        return augment.augment_conditional_forward(
            p["augment"], rng, x, None, nonlin=self.nonlin, use_context=False,
            dtype=self._dt)

    # ------------------------------------------------------------ log_prob

    def _prepare_layers(self, layers, *, inverse: bool = False):
        """Per-step precomputation hoisted out of the layer scan (currently:
        LinearLU packed-vector -> dense-weight folding)."""
        if self.permuter_type != "LinearLU":
            return layers
        if inverse:
            prepared = permuters.linear_lu_prepare_inverse_stack(
                layers["permuter"], eps=self.config["linear_lu_eps"])
        else:
            prepared = permuters.linear_lu_prepare_stack(
                layers["permuter"], eps=self.config["linear_lu_eps"],
                dtype=self._dt)
        return {**layers, "permuter": prepared}

    def _layer_fwd(self, lp, x, context, extra_context, rng=None):
        """One (coupling block, ActNorm?, permuter) step; returns (x, ldj)."""
        x, ldj = self._block_fwd(lp["block"], x, context, extra_context, rng)
        if self.use_act_norm:
            x, l2 = actnorm.actnorm_forward(lp["actnorm"], x)
            ldj = ldj + l2
        x, l3 = self._permuter_fwd(lp["permuter"], x)
        return x, ldj + l3

    def _can_fold_scan(self) -> bool:
        """Eligibility for the folded lax.scan core (ops/flow_layer_pallas.
        folded_scan_core): same graph family as the megakernel but
        differentiable and backend-independent — used by training and
        non-TPU eval. Disable with config folded_scan=False."""
        c = self.config
        return (bool(c.get("folded_scan", True))
                and not self.is_cif
                and self.flow_type == "AffineCoupling"
                and c["affine_scale_fn"] == "sigmoid"
                and self.permuter_type == "LinearLU" and self.use_act_norm)

    def _can_fuse_layers(self) -> bool:
        c = self.config
        # TPU-compiled only: the kernel relies on sequential grid execution
        # for its layer-carry aliasing, which interpret mode does not honor
        eligible = ((jax.default_backend() == "tpu" or _FORCE_FUSE_FOR_TRACE)
                    and self.fused_layers
                    and not self.is_cif
                    and self.flow_type == "AffineCoupling"
                    and c["affine_scale_fn"] == "sigmoid"
                    and self.permuter_type == "LinearLU" and self.use_act_norm
                    and self._dt == jnp.bfloat16)
        if eligible and jax.device_count() > 1 and self.fused_mesh is None:
            # CONTRACT (docs/kernels.md): the megakernels are single-device
            # programs — under an SPMD mesh XLA would have to partition the
            # pallas_call itself (never compiled, undefined behavior). Fall
            # back to the folded scan (same graph family, fully
            # SPMD-partitionable) instead of letting a multi-chip user
            # silently hit an unvalidated path. Opting into batch-axis
            # shard_map over the kernels is supported via the `fused_mesh`
            # constructor option; see docs/kernels.md.
            if not _MULTIDEVICE_FUSE_WARNED:
                _MULTIDEVICE_FUSE_WARNED.append(True)
                import warnings
                warnings.warn(
                    "fused_layers requested on a multi-device backend "
                    f"({jax.device_count()} devices): the flow megakernel "
                    "is validated single-device only; falling back to the "
                    "folded scan path (pass fused_mesh=... to run the "
                    "kernels batch-sharded under shard_map — "
                    "docs/kernels.md)")
            return False
        return eligible

    def _batchwise(self, fn, batch_args, replicated_args):
        """Run `fn(*batch_args, *replicated_args)` under shard_map with the
        batch (leading) axis of every batch_arg sharded over fused_mesh's
        'data' axis and replicated_args broadcast — the supported way to
        use the single-device Pallas megakernels on a multi-device mesh
        (each device executes the whole kernel on its batch shard; the
        kernels are embarrassingly parallel over items, so no collectives
        are needed and outputs concatenate along the batch axis)."""
        if self.fused_mesh is None:
            return fn(*batch_args, *replicated_args)
        import functools
        import inspect
        try:
            from jax import shard_map
        except ImportError:  # pre-0.8 jax
            from jax.experimental.shard_map import shard_map
        # the replication-check kwarg was renamed check_rep -> check_vma
        # in jax 0.8; bind whichever this version accepts
        _params = inspect.signature(shard_map).parameters
        _check_kw = ("check_vma" if "check_vma" in _params else "check_rep")
        shard_map = functools.partial(shard_map, **{_check_kw: False})
        from jax.sharding import PartitionSpec as P
        import jax.tree_util as jtu
        n_data = self.fused_mesh.shape["data"]
        b = next(a.shape[0] for a in batch_args if a is not None)
        if b % n_data != 0:
            raise ValueError(
                f"fused_mesh: batch {b} not divisible by the 'data' axis "
                f"size {n_data}")
        # Only ARRAY leaves may cross the shard_map boundary — the folded
        # kernel stacks also carry static Python ints (layer counts etc.)
        # that the kernel builders consume as plain ints; shard_map would
        # tracer-ify them. Keep the statics in the closure.
        flat_defs = []
        arr_operands = []
        for r in replicated_args:
            leaves, tdef = jtu.tree_flatten(r)
            mask = [hasattr(l, "shape") and hasattr(l, "dtype")
                    for l in leaves]
            flat_defs.append((tdef, leaves, mask))
            arr_operands.append([l for l, m in zip(leaves, mask) if m])

        n_batch = len(batch_args)

        def body(*args):
            reps = []
            for (tdef, leaves, mask), arrs in zip(flat_defs,
                                                  args[n_batch:]):
                it = iter(arrs)
                merged = [next(it) if m else l
                          for l, m in zip(leaves, mask)]
                reps.append(jtu.tree_unflatten(tdef, merged))
            return fn(*args[:n_batch], *reps)

        in_specs = tuple(P("data") if a is not None else P()
                         for a in batch_args)
        in_specs += tuple(P() for _ in arr_operands)
        wrapped = shard_map(
            body, mesh=self.fused_mesh, in_specs=in_specs,
            out_specs=P("data"))
        return wrapped(*batch_args, *arr_operands)

    def _layer_keys(self, rng):
        """Per-layer keys for CIF blocks (their augment/slice sample)."""
        if not self.is_cif:
            return None, None, rng
        keys = jax.random.split(rng, self.n_layers + 2)
        return keys[1:self.n_layers], keys[self.n_layers], keys[0]

    def log_prob(self, params, x, context=None, extra_context=None,
                 rng: Optional[jax.Array] = None,
                 training: bool = False) -> jnp.ndarray:
        """Per-point log p(x | context) of shape (B, N).

        training=True keeps every stage differentiable (the augmenter
        prologue kernel is eval-only; the flow megakernel has its own
        custom VJP and is used either way on the fused path)."""
        layer_keys, final_key, rng = self._layer_keys(rng)
        fuse = self._can_fuse_layers()
        from .ops import flow_layer_pallas as _flp
        if (fuse and not training
                and self.augmenter_kind == "conditional_attn"
                and _flp._FUSE_AUGMENTER):
            # fused augmenter prologue: same eps draw as normal_sample
            # (identical key + shape), numerics match to bf16 rounding
            aug_dim = self.latent_dim - self.input_dim
            eps = jax.random.normal(
                rng, (x.shape[0], x.shape[1], aug_dim), jnp.float32)
            folded_aug = _flp.fold_augmenter(
                params["augmenter"], input_dim=self.input_dim,
                extra_dim=(extra_context.shape[-1]
                           if extra_context is not None else 0))
            x, ldj = self._batchwise(_flp.fused_augmenter,
                                     (x, eps, context, extra_context),
                                     (folded_aug,))
        else:
            x, ldj = self._augment_fwd(params["augmenter"], rng, x, context,
                                       extra_context)
        ldj = ldj.astype(jnp.float32)
        layers = self._prepare_layers(params["layers"])

        if fuse:
            from .ops.flow_layer_pallas import (
                append_final_block, build_layer_stacks, fold_stacks)
            from .ops.flow_layer_vjp_pallas import fused_flow_layers_trainable
            stacks = build_layer_stacks(self, layers)
            # the final coupling block rides the same kernel as layer
            # n_flow_layers with identity ActNorm/LinearLU appended
            stacks = append_final_block(stacks, params["final_block"],
                                        self.latent_dim)
            stacks = fold_stacks(
                stacks, split=self.latent_dim // 2,
                extra_dim=(extra_context.shape[-1]
                           if extra_context is not None else 0))
            # custom-vjp wrapper: the primal IS the eval megakernel; under
            # jax.grad the segmented backward megakernel runs instead of
            # XLA autodiff (ops/flow_layer_vjp_pallas). Gradients reach the
            # raw params through the fold_stacks einsums above.
            x, ldj = self._batchwise(fused_flow_layers_trainable,
                                     (x, ldj, context, extra_context),
                                     (stacks,))
            return ldj + standard_normal_logprob(x)

        if self._can_fold_scan():
            from .ops.flow_layer_pallas import (
                append_final_block, build_layer_stacks, fold_stacks,
                folded_scan_core)
            stacks = append_final_block(
                build_layer_stacks(self, layers), params["final_block"],
                self.latent_dim)
            folded = fold_stacks(
                stacks, split=self.latent_dim // 2,
                extra_dim=(extra_context.shape[-1]
                           if extra_context is not None else 0))
            x, ldj = folded_scan_core(
                x, ldj, context, extra_context, folded, nonlin=self.nonlin,
                dtype=self._dt, remat=self.remat,
                unroll=self.config.get("scan_unroll", 1))
            return ldj + standard_normal_logprob(x)

        xs = (layers, layer_keys) if self.is_cif else layers

        def body(carry, lp):
            h, acc = carry
            if self.is_cif:
                lp, key = lp
            else:
                key = None
            h, l = self._layer_fwd(lp, h, context, extra_context, key)
            return (h, acc + l), None

        if self.remat:
            body = jax.checkpoint(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_emb"))
        (x, ldj), _ = jax.lax.scan(body, (x, ldj), xs,
                                   unroll=self.config.get("scan_unroll", 1))
        x, l = self._block_fwd(params["final_block"], x, context,
                               extra_context, final_key)
        return ldj + l + standard_normal_logprob(x)

    # -------------------------------------------------------------- sample

    def sample(self, params, key: jax.Array, num_samples: int, n_points: int,
               context=None, extra_context=None,
               sample_std: float = 0.6) -> jnp.ndarray:
        """Inverse/generative pass (reference Flow.sample, transform.py:79-84)."""
        layer_keys, final_key, key = self._layer_keys(key)
        z = normal_sample(key, (num_samples, n_points, self.latent_dim), 0.0,
                          sample_std)

        from .ops import flow_layer_pallas as _flp
        if self._can_fuse_layers() and _flp._FUSE_SAMPLING:
            # sampling megakernel: the final block and all layers run in one
            # REVERSE kernel (same conditioner math as the forward kernel,
            # ActNorm+LinearLU pre-inverted host-side)
            from .ops.flow_layer_pallas import (
                append_final_block, build_layer_stacks, fold_stacks,
                fold_stacks_inverse, fused_flow_layers_inverse)
            layers = self._prepare_layers(params["layers"])
            stacks = append_final_block(
                build_layer_stacks(self, layers), params["final_block"],
                self.latent_dim)
            folded = fold_stacks(
                stacks, split=self.latent_dim // 2,
                extra_dim=(extra_context.shape[-1]
                           if extra_context is not None else 0))
            z = self._batchwise(fused_flow_layers_inverse,
                                (z, context, extra_context),
                                (fold_stacks_inverse(stacks, folded),))
            return z[..., : self.input_dim]

        z = self._block_inv(params["final_block"], z, context, extra_context,
                            final_key)
        layers = self._prepare_layers(params["layers"], inverse=True)
        xs = (layers, layer_keys) if self.is_cif else layers

        def body(h, lp):
            if self.is_cif:
                lp, k = lp
            else:
                k = None
            h = self._permuter_inv(lp["permuter"], h)
            if self.use_act_norm:
                h = actnorm.actnorm_inverse(lp["actnorm"], h)
            h = self._block_inv(lp["block"], h, context, extra_context, k)
            return h, None

        z, _ = jax.lax.scan(body, z, xs, reverse=True)
        return z[..., : self.input_dim]

    # ----------------------------------------------- ActNorm data-dep init

    def data_dependent_init(self, params, x, context=None, extra_context=None,
                            rng: Optional[jax.Array] = None):
        """Functional replacement for torch's first-batch ActNorm self-init
        (models/act_norm.py:27-35): one lax.scan walks the layers, computing
        each ActNorm's shift/log_scale from the activations reaching it —
        a single compiled program, not a per-layer dispatch loop."""
        if not self.use_act_norm and not self.is_cif:
            return params
        layer_keys, _final_key, rng = self._layer_keys(rng)
        x, _ = self._augment_fwd(params["augmenter"], rng, x, context, extra_context)
        prepared = self._prepare_layers(params["layers"])
        xs = (prepared, layer_keys) if self.is_cif else prepared

        def body(h, lp):
            if self.is_cif:
                lp, key = lp
                h, _, new_cif_an = self._cif_block_fwd(
                    lp["block"], h, context, key, init_actnorm=True)
            else:
                new_cif_an = None
                h, _ = self._block_fwd(lp["block"], h, context, extra_context)
            new_an = (actnorm.actnorm_data_init(h) if self.use_act_norm
                      else None)
            if self.use_act_norm:
                h, _ = actnorm.actnorm_forward(new_an, h)
            h, _ = self._permuter_fwd(lp["permuter"], h)
            return h, (new_an, new_cif_an)

        _, (new_actnorms, new_cif_ans) = jax.lax.scan(body, x, xs)
        layers = dict(params["layers"])
        if self.use_act_norm:
            layers["actnorm"] = new_actnorms
        if self.is_cif:
            layers["block"] = {**layers["block"], "cif_actnorm": new_cif_ans}
        return {**params, "layers": layers}


# --------------------------------------------------------------- task API


def inner_loop(model: FlowCompareModel, params, state, batch, *,
               rng: Optional[jax.Array] = None, training: bool = False):
    """Forward pass of a batch -> (loss, per-point log_prob, nats, new_state).

    Mirrors reference inner_loop (model_initialization.py:206-228): truncate
    to input_dim, repeat extra context over points, embed t0, evaluate
    conditional log-prob of t1, nats = loss * log2(e) / input_dim.
    """
    c = model.config
    extract_0, extract_1, extra_context = batch
    extract_0 = extract_0[..., : model.input_dim]
    extract_1 = extract_1[..., : model.input_dim]
    if not c["using_extra_context"]:
        # the reference threads extra_context only when the config enables
        # it (model_initialization.py:33-45 derives using_extra_context;
        # inner_loop :211-213 repeats it conditionally) — a no-extra preset
        # fed a batch that carries the tensor must ignore it, not concat it
        extra_context = None
    if extra_context is not None:
        extra_context = jnp.broadcast_to(
            extra_context[:, None, :],
            (extract_1.shape[0], extract_1.shape[1], extra_context.shape[-1]))
    emb, new_state = model.embed(params, state, extract_0, training=training)
    if model.is_global:
        emb = jnp.broadcast_to(
            emb[:, None, :], (emb.shape[0], extract_1.shape[1], emb.shape[-1]))
    log_prob = model.log_prob(params, extract_1, emb, extra_context, rng,
                              training=training)
    loss = -jnp.mean(log_prob)
    nats = loss * LOG2E / c["input_dim"]
    return loss, log_prob, nats, new_state


def make_sample(model: FlowCompareModel, params, state, key: jax.Array,
                n_points: int, extract_0, extra_context=None,
                sample_std: float = 0.6, *, prefer_xla_embed: bool = False):
    """Generative pass (reference make_sample, model_initialization.py:231-245).

    prefer_xla_embed: embed the context through the XLA gather encoder
    (bit-exact vs the kernel in eval — docs/kernels.md); the trainer's
    periodic sample dumps set it so a degraded compile host that rejects
    the encoder kernels can't kill a training run at its first sampling
    step (CLAUDE.md)."""
    extract_0 = extract_0[..., : model.input_dim]
    emb, _ = model.embed(params, state, extract_0, training=False,
                         prefer_xla=prefer_xla_embed)
    if not model.config["using_extra_context"]:
        extra_context = None  # see inner_loop — config-gated like the reference
    if extra_context is not None:
        extra_context = jnp.broadcast_to(
            extra_context[:, None, :],
            (extract_0.shape[0], n_points, extra_context.shape[-1]))
    if model.is_global:
        emb = jnp.broadcast_to(
            emb[:, None, :], (emb.shape[0], n_points, emb.shape[-1]))
    x = model.sample(params, key, extract_0.shape[0], n_points, emb,
                     extra_context, sample_std)
    return x
