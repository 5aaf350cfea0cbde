"""PAConv score-weighted kernel assembly.

Replaces `pointnet2_paconv_cuda.assign_score_withk`
(lib/paconv_lib/src/gpu/assign_score_withk_gpu.cu:18-185) and the python
`assign_score` (util/paconv_util.py:52-57). The contraction

    out[b,n,k,o] = sum_m score[b,n,k,m] * (feat[b,n,k,:] @ bank[:, m, o])

has three algebraically identical TPU formulations, selected by the
trace-time `_FORM` flag (A/B: tools/ab_paconv_opt.py):

  * "einsum"  — one big matmul onto the whole weight bank, then an einsum
    over the m kernels. The einsum lowers to a broadcast-multiply-reduce
    over a (B, N, K, m, O) intermediate — HBM-heavy (the round-3 default).
  * "concat"  — fold the scores into the FEATURES first:
    out = (s ⊗ f).reshape(.., m*C) @ bank'. Identical MAC count
    (C·m·O per row either way), ONE matmul, no (m, O) reduce, and the
    outer product fuses into the matmul's operand production.
  * "per_m"   — m accumulated (C)x(O) matmuls with the score multiply in
    the epilogue; narrow output lanes for small O, kept for measurement.

All formulations contract in f32 on the MXU (preferred_element_type) and
differ only in bf16 rounding order; "concat" rounds s*f to bf16 before
the matmul, measured at ~1e-2 relative on random inputs (the shared
bf16-noise floor of the encoder stack).
"""

from __future__ import annotations

import jax.numpy as jnp

# Production default "concat": chip A/B 24.0 vs einsum 36.0 ms/batch
# same-worker (save/bench/ab_paconv_opt.json, 2026-08-20); change-map
# agreement vs the f32 scan unchanged from round 3 (99.56%/99.87%+,
# change_map_parity_good-surf.json).
# Env override for A/B tooling: FLOWCOMPARE_PACONV_FORM.
import os as _os

_FORM = _os.environ.get("FLOWCOMPARE_PACONV_FORM", "concat")


def paconv_assign_score(in_feat: jnp.ndarray, weightbank: jnp.ndarray,
                        scores: jnp.ndarray, m: int) -> jnp.ndarray:
    """in_feat: (B, N, K, C2), weightbank: (C2, m*O), scores: (B, N, K, m)
    -> (B, N, K, O)."""
    b, n, k, c2 = in_feat.shape
    if _FORM == "concat":
        # out[..o] = sum_{c,mm} (f_c * s_mm) W[c, mm, o]: one matmul with
        # contraction m*C2; bank reshaped (C2, m, O) -> (m*C2, O)
        bank = jnp.swapaxes(weightbank.reshape(c2, m, -1), 0, 1)  # (m,C2,O)
        bank = bank.reshape(m * c2, -1)
        sf = (scores[..., :, None].astype(in_feat.dtype)
              * in_feat[..., None, :]).reshape(b, n, k, m * c2)
        return jnp.matmul(sf, bank,
                          preferred_element_type=jnp.float32
                          ).astype(in_feat.dtype)
    if _FORM == "per_m":
        bank = weightbank.reshape(c2, m, -1)
        out = None
        for mm in range(m):
            t = jnp.matmul(in_feat, bank[:, mm],
                           preferred_element_type=jnp.float32)
            t = t * scores[..., mm:mm + 1].astype(t.dtype)
            out = t if out is None else out + t
        return out.astype(in_feat.dtype)
    cand = in_feat @ weightbank  # (B, N, K, m*O)
    cand = cand.reshape(b, n, k, m, -1)
    return jnp.einsum("bnkm,bnkmo->bnko", scores, cand,
                      preferred_element_type=jnp.float32).astype(in_feat.dtype)
