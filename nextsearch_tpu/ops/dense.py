"""Dense embedding ops: similarity top-k on the MXU.

Replaces the reference's brute-force O(V*d) scalar cosine scans
(src/semantic_embedding.cpp:104-145) with one matmul over the normalized
embedding matrix resident in HBM, plus masked top-k. Also powers the hybrid
retrieval dense rerank (BASELINE config 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("k",))
def similarity_topk(
    emb: jax.Array,  # f32 [V, d] L2-normalized embedding matrix
    qvecs: jax.Array,  # f32 [n, d] query vectors (normalized)
    banned: jax.Array,  # bool [V] rows excluded from results
    min_sim: jax.Array,  # f32 scalar similarity floor
    *,
    k: int,
):
    """Per query-vector top-k most similar rows with sim >= min_sim.

    Returns (sims f32 [n, k], rows int32 [n, k]); slots that fail the floor
    or fall in the banned set carry sim = -inf. Ties break toward the lower
    row index (canonical order; reference heap order is first-seen).
    """
    sims = jnp.dot(qvecs, emb.T, preferred_element_type=jnp.float32)  # [n, V]
    neg = jnp.float32(-jnp.inf)
    sims = jnp.where(banned[None, :], neg, sims)
    sims = jnp.where(sims < min_sim, neg, sims)
    vals, rows = lax.top_k(sims, k)
    return vals, rows.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def matvec_scores(emb: jax.Array, q: jax.Array) -> jax.Array:
    """Similarity of one vector against all rows (f32 matvec)."""
    return jnp.dot(emb, q, preferred_element_type=jnp.float32)
