"""Host-side wall-time attribution of the serving loop.

The device kernel costs 50.8 ms sync at the serving point (see
profile_serving.py) but bench.py records 55.6 ms/batch wall — this harness
splits the difference into host planning (plan_sparse), dispatch
(search_batch_async minus planning), blocking fetch (device_get) and result
unpacking (QueryResult construction), at the exact bench configuration.

Run on the real TPU:  python benchmarks/profile_host.py
Env: NEXTSEARCH_PROF_BATCH (512), NEXTSEARCH_PROF_DEPTH (8),
     NEXTSEARCH_PROF_ITERS (60).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    depth = int(os.environ.get("NEXTSEARCH_PROF_DEPTH", 8))
    iters = int(os.environ.get("NEXTSEARCH_PROF_ITERS", 60))
    blk = int(os.environ.get("NEXTSEARCH_PROF_BLOCK", 64))
    heavy_b = int(os.environ.get("NEXTSEARCH_PROF_HEAVYB", 512))

    import bench

    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.artifacts import load_artifact, save_artifact
    from nextsearch_tpu.index.segment import DeviceIndex

    cache_dir = os.path.join(
        "/tmp/nextsearch_bench_cache", f"{n_docs}_{vocab}_0"
    )
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()
    seg = load_artifact(cache_dir)
    if seg is None:
        seg, probs = bench.build_corpus(n_docs, vocab)
        save_artifact(seg, cache_dir)

    cfg = EngineConfig(
        device=DeviceConfig(
            mode="sparse", posting_block=blk, heavy_buckets=(heavy_b,),
            dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30,
        )
    )
    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    print(f"[host] index build+upload: {time.time()-t0:.0f}s", file=sys.stderr)
    batches = bench.sample_queries(probs, n_queries=40 * batch, batch=batch)
    pins = di.pin_shapes(batches)
    print(f"[host] pins={pins}", file=sys.stderr)

    # warm/compile
    di.search_batch(batches[0], k=10)

    # 1. host planning alone
    t0 = time.perf_counter()
    for b in batches[:20]:
        di.plan_sparse(b)
    t_plan = (time.perf_counter() - t0) / 20 * 1000
    print(f"[host] plan_sparse: {t_plan:.2f} ms/batch", file=sys.stderr)

    # 2. steady-state pipeline with per-call stamps
    t_async = []
    t_gather = []
    window = []
    wall0 = time.perf_counter()
    for i in range(iters + depth):
        a0 = time.perf_counter()
        window.append(di.search_batch_async(batches[i % len(batches)], k=10))
        t_async.append(time.perf_counter() - a0)
        if len(window) > depth:
            g0 = time.perf_counter()
            di.search_batch_gather(window.pop(0))
            t_gather.append(time.perf_counter() - g0)
    while window:
        di.search_batch_gather(window.pop(0))
    wall = (time.perf_counter() - wall0) / (iters + depth) * 1000

    # 3. unpack cost alone: fetch once, re-unpack
    h = di.search_batch_async(batches[0], k=10)
    out = np.asarray(jax.device_get(h[4]))
    K = h[3]
    u0 = time.perf_counter()
    for _ in range(20):
        res = []
        for qi in range(batch):
            vals = out[qi, :K]
            keep = vals > 0.0
            keep[10:] = False
            res.append((vals[keep][:10], out[qi, K:2 * K][keep][:10]))
    t_unpack = (time.perf_counter() - u0) / 20 * 1000

    a_ms = np.median(t_async) * 1000
    g_ms = np.median(t_gather) * 1000
    print(f"\n=== host wall attribution (ms/batch of {batch}, depth {depth}) ===")
    print(f"wall/batch       {wall:8.2f}  ({batch/wall*1000:.0f} qps)")
    print(f"async (plan+dispatch) {a_ms:8.2f}  (plan alone {t_plan:.2f})")
    print(f"gather (block+unpack) {g_ms:8.2f}  (unpack alone {t_unpack:.2f})")
    print(f"async+gather sum      {a_ms + g_ms:8.2f}")


if __name__ == "__main__":
    main()
