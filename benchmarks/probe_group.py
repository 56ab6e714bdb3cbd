"""Probe: multi-launch group path vs single-launch at the serving point.

The ~13 ms per-launch floor (profile_serving "base") is paid once per
batch; the group path (launch_group sub-batches in ONE launch) amortizes
it G-fold IF per-group device cost matches the single-batch kernel. This
probe pins the GROUP scope (Qb = launch_group) explicitly — the thing the
batch-1024 bench run missed (it pinned only the 1024 envelope, so groups
ran ladder-inflated C/U) — and times:

    single   batch-512 launches, depth-8 pipeline (the headline path)
    groupG   batch 512*G through the same pipeline (G groups per launch)

Run on the real TPU: python benchmarks/probe_group.py
Env: NEXTSEARCH_PROBE_GROUPS (comma list, default "2,4"),
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


def throughput(di, batches, *, depth=8, secs=8.0, k=10):
    di.search_batch(batches[0], k=k)  # warm/compile
    window = []
    n_done = 0
    i = 0
    t0 = time.time()
    while time.time() - t0 < secs or not n_done:
        window.append(di.search_batch_async(batches[i % len(batches)], k=k))
        if len(window) > depth:
            di.search_batch_gather(window.pop(0))
            n_done += len(batches[0])
        i += 1
    while window:
        di.search_batch_gather(window.pop(0))
        n_done += len(batches[0])
    return n_done / (time.time() - t0)


def main():
    import bench
    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.artifacts import load_artifact, save_artifact
    from nextsearch_tpu.index.segment import DeviceIndex

    n_docs = int(os.environ.get("NEXTSEARCH_PROBE_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROBE_VOCAB", 200_000))
    secs = float(os.environ.get("NEXTSEARCH_PROBE_SECS", 8))
    groups = [
        int(g)
        for g in os.environ.get("NEXTSEARCH_PROBE_GROUPS", "2,4").split(",")
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

    base = 512
    gmax = max(groups)
    batches512 = bench.sample_queries(
        probs, n_queries=40 * base * gmax // gmax, batch=base
    )
    pins = di.pin_shapes(batches512, scope_q=True)
    print(f"[probe] 512-scope pins: {pins}", file=sys.stderr)

    qps1 = throughput(di, batches512, depth=8, secs=secs)
    print(f"[probe] single 512: {qps1:.0f} qps "
          f"({base/qps1*1000:.1f} ms/batch)", file=sys.stderr)

    for g in groups:
        big = [
            sum((batches512[(i * g + j) % len(batches512)] for j in range(g)), [])
            for i in range(len(batches512) // g)
        ]
        # pin the BIG envelope too (C/U/W/L for the outer batch size are
        # consulted before grouping splits it? no — the group path sizes
        # budgets per group; this pin only freezes the big Q bucket probe)
        qps = throughput(di, big, depth=max(2, 8 // g), secs=secs)
        print(f"[probe] group x{g} (batch {base*g}): {qps:.0f} qps "
              f"({base*g/qps*1000:.1f} ms/launch)", file=sys.stderr)


if __name__ == "__main__":
    main()
