"""Tracing / profiling utilities.

The reference's only instrumentation is an opt-in wall-clock per batch via
perf_counter + cuda.synchronize gated by config['time_stats']
(train.py:95-97,122-126). The trainer here always logs `time_batch`; this
module adds:

  * StepTimer — explicit begin/end step timing with forced device sync
    (on hosted-TPU tunnels block_until_ready can return early; a tiny
    host readback is the reliable fence)
  * trace(...) — a jax.profiler trace context, opt-in (the profiler can
    hang on remote-compile backends; never enabled implicitly)
  * flop_estimate(...) — analytic FLOP count for the flagship architecture,
    used to report achieved TFLOP/s next to measured step times
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


def device_fence(x) -> None:
    """Reliable device sync: force a tiny host readback."""
    arr = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(arr.ravel()[0] if hasattr(arr, "ravel") else arr))


class StepTimer:
    """Accumulates per-step wall times with proper device fencing."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            device_fence(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {"mean_s": float(arr.mean()), "p50_s": float(np.median(arr)),
                "min_s": float(arr.min()), "n": len(arr)}


@contextlib.contextmanager
def trace(log_dir: str):
    """Opt-in jax.profiler trace (inspect with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flop_estimate(config: dict, batch_size: int) -> float:
    """Forward-pass FLOPs of the flow stack for one batch (analytic)."""
    c = config
    n_pts = batch_size * c["sample_size"]
    lat, hid = c["latent_dim"], c["hidden_dims"]
    split = lat // 2
    ctx_dim = (c["attn_dim"] if not c.get("global") else
               c["input_embedding_dim"]) + c.get("extra_context_dim", 0)

    def mlp_macs(i, hs, o):
        dims = [i] + list(hs) + [o]
        return sum(a * b for a, b in zip(dims[:-1], dims[1:]))

    per_layer = mlp_macs(split + ctx_dim, hid, (lat - split) * 2)
    if not c.get("global"):
        per_layer += mlp_macs(split, c["pre_attention_mlp_hidden_dims"],
                              c["attn_input_dim"])
        d = c["cross_heads"] * c["cross_dim_head"]
        per_layer += c["attn_input_dim"] * d + d * c["attn_dim"]
        per_layer += 2 * c["n_samples_context"] * d  # scores + values
    if c["permuter_type"] in ("LinearLU", "FullCombiner", "ExponentialCombiner"):
        per_layer += lat * lat
    total_macs = per_layer * c["n_flow_layers"] * n_pts
    return 2.0 * total_macs
