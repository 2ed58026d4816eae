"""Device nearest-neighbor retrieval: one distance matmul + top-k.

The reference does retrieval with brute-force float64 numpy on host
(eval/evaluate.py:175-176) — fine for thousands of elements, quadratic-slow at
city scale.  This runs the same brute-force search as a device matmul + lax.top_k,
chunked over queries to bound memory; used by the evaluator for large sets.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def topk_l2(map_emb: np.ndarray, query_emb: np.ndarray, k: int,
            chunk: int = 4096) -> np.ndarray:
    """Indices (n_query, k) of the k nearest map embeddings by L2 distance."""
    k = min(k, len(map_emb))
    m = jnp.asarray(map_emb, jnp.float32)
    m_sq = jnp.sum(m * m, axis=1)

    @jax.jit
    def run(q):
        q = q.astype(jnp.float32)
        d = (
            jnp.sum(q * q, axis=1)[:, None]
            + m_sq[None, :]
            - 2.0 * (q @ m.T)
        )
        _, idx = jax.lax.top_k(-d, k)
        return idx

    outs = []
    for s in range(0, len(query_emb), chunk):
        outs.append(np.asarray(run(jnp.asarray(query_emb[s : s + chunk]))))
    return np.concatenate(outs) if outs else np.zeros((0, k), np.int64)
