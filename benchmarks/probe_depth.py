"""Probe: (QPS, p50) vs pipeline depth at the throughput operating point.

The headline runs batch 512 at depth 8 and reports p50 = 327 ms — a
request sits behind `depth` in-flight launches, so p50 ~= depth x
per-batch device time + transport. If serving is device-bound (the
group-path probe measured the launch floor as fully pipeline-hidden),
a shallower window should keep QPS and cut p50 linearly. This probe
builds once and sweeps depth, so bench.py's default depth can be chosen
from measured (QPS, p50) pairs instead of "8 hides everything".

Run on the real TPU: python benchmarks/probe_depth.py
Env: NEXTSEARCH_PROBE_DEPTHS (comma list, default "2,3,4,6,8"),
     NEXTSEARCH_PROBE_SECS (default 8).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def run_point(di, batches, *, depth, secs, k=10):
    batch = len(batches[0])
    lat = []
    window = []
    n_done = 0
    i = 0
    t0 = time.time()
    while time.time() - t0 < secs or not n_done:
        b0 = time.time()
        window.append((b0, di.search_batch_async(batches[i % len(batches)], k=k)))
        if len(window) > depth:
            s0, h = window.pop(0)
            di.search_batch_gather(h)
            lat.append(time.time() - s0)
            n_done += batch
        i += 1
    while window:
        s0, h = window.pop(0)
        di.search_batch_gather(h)
        lat.append(time.time() - s0)
        n_done += batch
    qps = n_done / (time.time() - t0)
    return qps, float(np.median(lat)) * 1000


def main():
    import bench
    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.artifacts import load_artifact, save_artifact
    from nextsearch_tpu.index.segment import DeviceIndex

    n_docs = int(os.environ.get("NEXTSEARCH_PROBE_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROBE_VOCAB", 200_000))
    secs = float(os.environ.get("NEXTSEARCH_PROBE_SECS", 8))
    depths = [
        int(d)
        for d in os.environ.get("NEXTSEARCH_PROBE_DEPTHS", "2,3,4,6,8").split(",")
    ]

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
            mode="sparse", posting_block=64, heavy_buckets=(512,),
            dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30,
        )
    )
    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    print(f"[probe] index build+upload: {time.time()-t0:.0f}s", file=sys.stderr)

    batch = 512
    batches = bench.sample_queries(probs, n_queries=200 * batch, batch=batch)
    pins = di.pin_shapes(batches, scope_q=True)
    print(f"[probe] pins: {pins}", file=sys.stderr)
    di.search_batch(batches[0], k=10)  # warm/compile

    for d in depths:
        qps, p50 = run_point(di, batches, depth=d, secs=secs)
        print(
            f"[probe] depth {d}: {qps:.0f} qps, p50 {p50:.1f} ms",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
