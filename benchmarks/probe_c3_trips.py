"""Why does EVAL config 3 trip the fast-heavy guard 2-4% per batch?

Builds config 3's exact serving index (cached 4x250k segments, merged
heavy rows), runs one batch with the guard column exposed, and for every
tripped query prints the guard quantities: tau (K2-th approximate
selection value), kth (exact K-th rescored score), their ratio, and the
exact oracle scores around the K2 boundary — distinguishing
  (a) genuine boundary TIES (kth == tau exactly: no eps can pass; the
      pool provably cannot order doc-asc ties beyond its width),
  (b) near-ties inside the eps band (a tighter measured eps would pass),
  (c) real precision escapes (approx selection misranked something).

Run on the real TPU: python benchmarks/probe_c3_trips.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from bench import sample_queries  # noqa: E402
from benchmarks.eval_configs import _cached_corpus, _pinned_index  # noqa: E402
from nextsearch_tpu.index.oracle import oracle_search_vec  # noqa: E402


def main():
    vocab = 200_000
    segs = [_cached_corpus(250_000, vocab, 10 + i) for i in range(4)]
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()
    batches = sample_queries(probs, 1024, 512, seed=3)
    di = _pinned_index(
        segs, batches, blk=64, mode="sparse",
        dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30,
    )

    import jax

    for bi, batch in enumerate(batches[:2]):
        handle = di.search_batch_async(batch, k=10)
        assert handle[0] == "packedg", handle[0]
        _tag, nq, k, K, dev_out, _relaunch, perm, queries = handle[:8]
        out = np.asarray(jax.device_get(dev_out))
        tripped = np.flatnonzero(out[:nq, 2 * K + 1] < 0.5)
        print(f"batch {bi}: {tripped.size}/{nq} tripped", flush=True)
        for j in tripped[:8]:
            terms = queries[j]
            hits, found = oracle_search_vec(
                di._oracle_segs(), terms, 48,
                k1=di.config.bm25.k1, b=di.config.bm25.b,
            )
            scores = np.asarray([h[0] for h in hits], np.float32)
            kth = scores[K - 1] if scores.size >= K else 0.0
            dfs = [
                (t, sum(lex[t][1] for lex in di.lex if t in lex))
                for t, _w in terms
            ]
            k2 = 32
            b_lo = scores[k2 - 1] if scores.size >= k2 else 0.0
            n_tied_kth = int((scores == kth).sum())
            n_tied_b = int((scores == b_lo).sum())
            print(
                f"  q{j}: terms={dfs} found={found} "
                f"kth={kth:.9g} K2th={b_lo:.9g} "
                f"kth/K2th-1={kth / b_lo - 1 if b_lo else float('nan'):.3e} "
                f"ties@kth={n_tied_kth} ties@K2={n_tied_b}",
                flush=True,
            )
            print(
                "    top40:",
                " ".join(f"{s:.7g}" for s in scores[:40]),
                flush=True,
            )


if __name__ == "__main__":
    main()
