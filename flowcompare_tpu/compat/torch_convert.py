"""PyTorch checkpoint -> param-pytree converter.

Maps the reference's released `.pt` checkpoints (save_flow dicts:
{config, optimizer, flow, input_embedder, scheduler} —
model_initialization.py:25-28) onto this framework's parameter tree so that
`evaluate_on_test` reproduces the published nats from converted weights.

Layout conventions converted here:
  * torch Linear weight (out, in)        -> ours (in, out): transpose
  * torch Conv1d/2d weight (out, in, 1[,1]) -> (in, out): squeeze+transpose
  * BatchNorm weight/bias -> params scale/bias; running stats -> bn state
  * flow transforms list: [augmenter] + n x [block, actnorm, permuter] with
    per-layer params STACKED along axis 0 for the scan path.

The state-dict key schema is dictated by the reference module structure
(Flow.transforms.{i}. ...; see tests/test_torch_parity.py, which builds the
actual reference model and checks output parity after conversion).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd: Dict[str, Any], prefix: str, bias: bool = True) -> dict:
    out = {"w": _t(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        out["b"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _mlp(sd: Dict[str, Any], prefix: str) -> dict:
    hidden = []
    i = 0
    while f"{prefix}.layers.{i}.weight" in sd:
        hidden.append(_lin(sd, f"{prefix}.layers.{i}"))
        i += 1
    return {"in": _lin(sd, f"{prefix}.in_layer"),
            "hidden": hidden,
            "out": _lin(sd, f"{prefix}.out_layer")}


def _attn(sd: Dict[str, Any], prefix: str) -> dict:
    """PreNorm(AttentionControlledOut(AttentionMine)) (perceiver.py:89-122)."""
    return {
        "norm": {"scale": np.asarray(sd[f"{prefix}.norm.weight"]),
                 "bias": np.asarray(sd[f"{prefix}.norm.bias"])},
        "to_q": _lin(sd, f"{prefix}.fn.attention.to_q", bias=False),
        "to_kv": _lin(sd, f"{prefix}.fn.attention.to_kv", bias=False),
        "out": _lin(sd, f"{prefix}.fn.lin"),
    }


def _conv_bn(sd: Dict[str, Any], conv_prefix: str, bn_prefix: str) -> Tuple[dict, dict]:
    w = np.asarray(sd[f"{conv_prefix}.weight"])
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in, 1[,1]) -> (out, in)
    params = {"conv": {"w": _t(w)},
              "bn": {"scale": np.asarray(sd[f"{bn_prefix}.weight"]),
                     "bias": np.asarray(sd[f"{bn_prefix}.bias"])}}
    state = {"mean": np.asarray(sd[f"{bn_prefix}.running_mean"]),
             "var": np.asarray(sd[f"{bn_prefix}.running_var"])}
    return params, state


def convert_flow_state_dict(flow_sd: Dict[str, Any], config: dict) -> dict:
    """Reference Flow state dict -> {augmenter, layers(stacked), final_block}."""
    n_layers = config["n_flow_layers"]
    act_norm = bool(config["act_norm"])
    is_global = config["input_embedder"] in ("DGCNNembedderGlobal",)
    per_layer = 1 + (1 if act_norm else 0) + 1  # block, actnorm?, permuter

    t = 0
    # ---- augmenter (transforms.0)
    if config["latent_dim"] == config["input_dim"]:
        augmenter = {}
    elif config["use_attn_augment"]:
        p = f"transforms.{t}"
        augmenter = {
            "pre_attn_mlp": _mlp(flow_sd, f"{p}.pre_attn_mlp"),
            "attn": _attn(flow_sd, f"{p}.attn"),
            "augment": {"net": _mlp(flow_sd, f"{p}.augment.noise_dist.net")},
        }
    else:
        augmenter = {"net": _mlp(flow_sd, f"transforms.{t}.noise_dist.net")}
    t += 1

    is_cif = config.get("cif_latent_dim", config["latent_dim"]) > config["latent_dim"]

    def _coupling_extras(block: dict, prefix: str):
        if config["flow_type"] == "ExponentialCoupling":
            for k in ("scale", "shift", "rescale", "reshift"):
                block["coupling"][k] = np.asarray(flow_sd[f"{prefix}.{k}"])

    def block_at(idx: int) -> dict:
        p = f"transforms.{idx}"
        if is_cif:
            # CIFblock (models/cif_block.py:49-68): augmenter + affine_cif +
            # act_norm + inner PreConditionApplier flow. The slicer SHARES
            # the augmenter's ConditionalNormal net (cif_block.py:58), so
            # only the augmenter copy is read.
            block = {
                "coupling": {"nn": _mlp(flow_sd, f"{p}.flow.transform.nn")},
                "pre_attention_mlp": _mlp(
                    flow_sd, f"{p}.flow.pre_conditioner.pre_attention_mlp"),
                "attn": _attn(flow_sd, f"{p}.flow.pre_conditioner.attn"),
                "cif_net": _mlp(flow_sd, f"{p}.augmenter.noise_dist.net"),
                "affine_cif": {"nn": _mlp(flow_sd, f"{p}.affine_cif.nn")},
                "cif_actnorm": {
                    "shift": np.asarray(flow_sd[f"{p}.act_norm.shift"]),
                    "log_scale": np.asarray(flow_sd[f"{p}.act_norm.log_scale"])},
            }
            _coupling_extras(block, f"{p}.flow.transform")
            return block
        block = {"coupling": {"nn": _mlp(flow_sd, f"{p}.transform.nn")}}
        if not is_global:
            block["pre_attention_mlp"] = _mlp(
                flow_sd, f"{p}.pre_conditioner.pre_attention_mlp")
            block["attn"] = _attn(flow_sd, f"{p}.pre_conditioner.attn")
        _coupling_extras(block, f"{p}.transform")
        return block

    def actnorm_at(idx: int) -> dict:
        p = f"transforms.{idx}"
        return {"shift": np.asarray(flow_sd[f"{p}.shift"]),
                "log_scale": np.asarray(flow_sd[f"{p}.log_scale"])}

    def permuter_at(idx: int) -> dict:
        p = f"transforms.{idx}"
        kind = config["permuter_type"]
        if kind == "LinearLU":
            return {k: np.asarray(flow_sd[f"{p}.{k}"]) for k in
                    ("lower_entries", "upper_entries", "unconstrained_upper_diag")}
        if kind == "random_permute":
            perm = np.asarray(flow_sd[f"{p}.permutation"])
            return {"permutation": perm, "inv_permutation": np.argsort(perm)}
        if kind == "FullCombiner":
            return {"w": np.asarray(flow_sd[f"{p}.w"])}
        if kind == "ExponentialCombiner":
            return {k: np.asarray(flow_sd[f"{p}.{k}"]) for k in
                    ("w", "scale", "shift", "rescale", "reshift")}
        raise ValueError(kind)

    layer_list = []
    for i in range(n_layers - 1):
        base = t + i * per_layer
        lp = {"block": block_at(base)}
        nxt = base + 1
        if act_norm:
            lp["actnorm"] = actnorm_at(nxt)
            nxt += 1
        lp["permuter"] = permuter_at(nxt)
        layer_list.append(lp)
    final_block = block_at(t + (n_layers - 1) * per_layer)

    import jax
    layers = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *layer_list)
    return {"augmenter": augmenter, "layers": layers, "final_block": final_block}


def convert_dgcnn_state_dict(emb_sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """DGCNNembedder / DGCNNembedderGlobal (pytorch_gcn.py:50-188).

    The torch modules register convs as Sequential(conv, bn, leaky):
    conv{i}.0 = conv weights, bn{i} = the shared BatchNorm (also aliased
    as conv{i}.1)."""
    params, state = {}, {}
    for i in range(1, 6):
        p, s = _conv_bn(emb_sd, f"conv{i}.0", f"bn{i}")
        params[f"conv{i}"], state[f"bn{i}"] = p, s
    params["out_mlp"] = _mlp(emb_sd, "out_mlp")
    return params, state


def convert_paconv_state_dict(emb_sd: Dict[str, Any]) -> Tuple[dict, dict]:
    """PointNet2SSGSeg / PAConv encoder (scene_seg_PAConv):

    SA_modules.{i}.mlps.0.layer{j}: ScoreNet convs+BNs, weightbank, block BN;
    FP_modules.{i}.mlp.layer{j}: conv + nested bn.bn; out_mlp: residual MLP.
    The last ScoreNet BN exists in the state dict but is never applied
    (ScoreNet registers a BN per layer, applies all but the last —
    paconv.py:25-41) and is deliberately skipped here.
    """
    def bn_of(prefix):
        return ({"scale": np.asarray(emb_sd[f"{prefix}.weight"]),
                 "bias": np.asarray(emb_sd[f"{prefix}.bias"])},
                {"mean": np.asarray(emb_sd[f"{prefix}.running_mean"]),
                 "var": np.asarray(emb_sd[f"{prefix}.running_var"])})

    def conv_w(key):
        w = np.asarray(emb_sd[key])
        return _t(w.reshape(w.shape[0], w.shape[1]))

    params: Dict[str, Any] = {"sa": [], "fp": []}
    state: Dict[str, Any] = {"sa": [], "fp": []}
    for i in range(4):
        lp_list, ls_list = [], []
        j = 0
        while f"SA_modules.{i}.mlps.0.layer{j}.weightbank" in emb_sd:
            base = f"SA_modules.{i}.mlps.0.layer{j}"
            score_layers_p, score_layers_s = [], []
            k = 0
            while f"{base}.scorenet.mlp_convs_hidden.{k}.weight" in emb_sd:
                lin = {"w": conv_w(f"{base}.scorenet.mlp_convs_hidden.{k}.weight")}
                bkey = f"{base}.scorenet.mlp_convs_hidden.{k}.bias"
                if bkey in emb_sd:
                    lin["b"] = np.asarray(emb_sd[bkey])
                is_last = (f"{base}.scorenet.mlp_convs_hidden.{k+1}.weight"
                           not in emb_sd)
                if is_last:
                    bn_p, bn_s = None, None
                else:
                    bn_p, bn_s = bn_of(f"{base}.scorenet.mlp_bns_hidden.{k}")
                score_layers_p.append({"lin": lin, "bn": bn_p})
                score_layers_s.append(bn_s)
                k += 1
            blk_bn_p, blk_bn_s = bn_of(f"{base}.bn")
            lp_list.append({
                "scorenet": {"layers": score_layers_p},
                "weightbank": np.asarray(emb_sd[f"{base}.weightbank"]),
                "bn": blk_bn_p,
            })
            ls_list.append({"scorenet": {"layers": score_layers_s},
                            "bn": blk_bn_s})
            j += 1
        params["sa"].append(lp_list)
        state["sa"].append(ls_list)
    for i in range(4):
        layers_p, layers_s = [], []
        j = 0
        while f"FP_modules.{i}.mlp.layer{j}.conv.weight" in emb_sd:
            base = f"FP_modules.{i}.mlp.layer{j}"
            bn_p, bn_s = bn_of(f"{base}.bn.bn")
            layers_p.append({"lin": {"w": conv_w(f"{base}.conv.weight")},
                             "bn": bn_p})
            layers_s.append(bn_s)
            j += 1
        params["fp"].append({"layers": layers_p})
        state["fp"].append({"layers": layers_s})
    params["out_mlp"] = _mlp(emb_sd, "out_mlp")
    return params, state


def convert_checkpoint(save_dict: Dict[str, Any], config: dict) -> Tuple[dict, dict]:
    """Full reference save_flow dict -> (params, bn_state).

    save_dict['flow'] / save_dict['input_embedder'] are state dicts whose
    tensor values may be torch Tensors or numpy arrays (np.asarray handles
    both; pass tensors through .cpu() first if loading with torch).
    """
    params = convert_flow_state_dict(dict(save_dict["flow"]), config)
    emb_sd = dict(save_dict["input_embedder"])
    kind = config["input_embedder"]
    state: dict = {}
    if kind in ("DGCNNembedder", "DGCNNembedderGlobal"):
        params["embedder"], state["embedder"] = convert_dgcnn_state_dict(emb_sd)
    elif kind == "PAConv":
        params["embedder"], state["embedder"] = convert_paconv_state_dict(emb_sd)
    elif kind == "idenity":
        params["embedder"], state["embedder"] = {}, {}
    else:
        raise ValueError(f"unknown embedder kind {kind}")
    import jax.numpy as jnp
    import jax
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), params)
    state = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float32), state)
    return params, state


def load_torch_checkpoint(path: str):
    """Load a reference .pt file -> (config, params, bn_state)."""
    import torch
    save_dict = torch.load(path, map_location="cpu")
    raw_config = dict(save_dict["config"])
    from ..configs.presets import from_checkpoint_config
    config = from_checkpoint_config(raw_config)
    to_np = lambda sd: {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
                        for k, v in sd.items()}
    save_np = {"flow": to_np(save_dict["flow"]),
               "input_embedder": to_np(save_dict["input_embedder"])}
    params, state = convert_checkpoint(save_np, config)
    return config, params, state
