"""Hybrid retrieval: BM25 candidate generation + dense rerank on TPU.

BASELINE config 5 ("BM25 candidates + semantic_embedding dense rerank fused
on TPU"). The reference has no document embeddings; we derive them at build
time as the tf-weighted mean of each document's term embeddings (terms the
SemanticIndex knows), L2-normalized — the classic fastText-style doc vector.
Query embeddings use the same construction over the weighted query terms.

Final score: beta * bm25/max_bm25(query) + (1-beta) * max(cos, 0), reranked
entirely on device (ops/dense.hybrid_rerank).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..index.builder import SegmentArrays
from ..index.segment import QueryResult, WeightedTerm
from .semantic import SemanticIndex


class HybridIndex:
    """Doc-embedding store + fused rerank over a BM25 index's candidates.

    `index` is a DeviceIndex or a ShardedIndex — anything providing the
    common index interface (slot_capacity, segment_slot_bases,
    search_batch_async/gather).
    """

    def __init__(
        self,
        index,
        sem: SemanticIndex,
        beta: float = 0.5,
        chunk: int = 262144,
    ):
        import jax
        import jax.numpy as jnp

        assert sem.enabled, "hybrid rerank needs a loaded SemanticIndex"
        self.index = index
        self.sem = sem
        self.beta = float(beta)
        d = sem.dim

        # Build doc embeddings: scatter tf-weighted term vectors per doc.
        # slot_capacity / segment_slot_bases are the common index interface —
        # works for both DeviceIndex (contiguous slots) and ShardedIndex
        # (shard-major global slots).
        n_slots = index.slot_capacity
        emb_host = sem._emb_host
        doc_emb = np.zeros((n_slots, d), np.float32)
        weight_sum = np.zeros(n_slots, np.float32)
        for seg, dbase in zip(index.segments, index.segment_slot_bases()):
            rows = np.array(
                [sem.term_to_row.get(t, -1) for t in seg.terms], np.int64
            )
            row_per_post = np.repeat(rows, np.diff(seg.term_offsets))
            known = row_per_post >= 0
            docs = seg.post_doc[known].astype(np.int64) + dbase
            tfs = seg.post_tf[known].astype(np.float32)
            vecs = emb_host[row_per_post[known]]
            np.add.at(doc_emb, docs, vecs * tfs[:, None])
            np.add.at(weight_sum, docs, tfs)
        norms = np.linalg.norm(doc_emb, axis=1)
        norms[norms == 0.0] = 1.0
        doc_emb /= norms[:, None]
        self.doc_emb = jnp.asarray(doc_emb)

    def query_embedding(self, terms: Sequence[WeightedTerm]) -> np.ndarray:
        d = self.sem.dim
        q = np.zeros(d, np.float32)
        for t, w in terms:
            v = self.sem.get_vec(t)
            if v is not None:
                q += np.float32(w) * v
        n = float(np.linalg.norm(q))
        if n > 0:
            q = q / np.float32(n)
        return q

    def search_batch(
        self,
        queries: Sequence[Sequence[WeightedTerm]],
        k: int,
        candidates: int = 100,
    ) -> List[QueryResult]:
        """BM25 top-`candidates` then fused dense rerank to top-k."""
        import jax
        import jax.numpy as jnp

        from ..ops.dense import hybrid_rerank

        nq = len(queries)
        if nq == 0 or self.index.n_docs == 0:
            return [
                QueryResult(np.empty(0, np.float32), np.empty(0, np.int32), 0)
            ] * nq

        C = max(candidates, k)
        handle = self.index.search_batch_async(queries, C)
        if handle[0] == "empty":
            return self.index.search_batch_gather(handle)
        if handle[0] == "packed":
            import jax.numpy as jnp_

            _tag, _nq, _k, K, out_arr = handle
            vals = out_arr[:, :K]
            # ids packed as exact f32 values (TPU flushes denormal bitcasts)
            idx = out_arr[:, K : 2 * K].astype(jnp_.int32)
            found = out_arr[:, 2 * K].astype(jnp_.int32)
        else:
            _tag, _nq, _k, K, vals, idx, found = handle

        q_emb = np.stack([self.query_embedding(q) for q in queries])
        Qb = vals.shape[0]
        if q_emb.shape[0] < Qb:
            q_emb = np.vstack(
                [q_emb, np.zeros((Qb - q_emb.shape[0], self.sem.dim), np.float32)]
            )

        hvals, hdocs, hbm25 = hybrid_rerank(
            self.doc_emb, jnp.asarray(q_emb), idx, vals,
            jnp.float32(self.beta), K=min(k, K),
        )
        hvals, hdocs, hbm25, found = jax.device_get((hvals, hdocs, hbm25, found))

        out: List[QueryResult] = []
        for qi in range(nq):
            keep = hbm25[qi] > 0.0
            out.append(
                QueryResult(
                    scores=hvals[qi][keep][:k],
                    doc_slots=hdocs[qi][keep][:k],
                    found=int(found[qi]),
                )
            )
        return out
