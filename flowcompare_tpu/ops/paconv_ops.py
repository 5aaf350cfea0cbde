"""PAConv score-weighted kernel assembly.

Replaces `pointnet2_paconv_cuda.assign_score_withk`
(lib/paconv_lib/src/gpu/assign_score_withk_gpu.cu:18-185) and the python
`assign_score` (util/paconv_util.py:52-57). The contraction

    out[b,n,k,o] = sum_m score[b,n,k,m] * (feat[b,n,k,:] @ bank[:, m, o])

is expressed as one big matmul onto the weight bank followed by a small
einsum over the m kernels — both MXU ops, with the backward derived by
autodiff (the CUDA version needed two hand-written scatter-add kernels).
"""

from __future__ import annotations

import jax.numpy as jnp


def paconv_assign_score(in_feat: jnp.ndarray, weightbank: jnp.ndarray,
                        scores: jnp.ndarray, m: int) -> jnp.ndarray:
    """in_feat: (B, N, K, C2), weightbank: (C2, m*O), scores: (B, N, K, m)
    -> (B, N, K, O)."""
    b, n, k, _ = in_feat.shape
    cand = in_feat @ weightbank  # (B, N, K, m*O)
    cand = cand.reshape(b, n, k, m, -1)
    return jnp.einsum("bnkm,bnkmo->bnko", scores, cand,
                      preferred_element_type=jnp.float32).astype(in_feat.dtype)
