"""Measure ShardedIndex overhead vs DeviceIndex at parity shapes.

VERDICT r1 item 5: the sharded launch path (packed transport + shard_map
merge) should cost <10% over the single-device path when the mesh is (1,1)
— i.e. the shard_map/all_gather plumbing itself, not cross-chip work.

Run on the real TPU:  python benchmarks/sharded_overhead.py
Env: NEXTSEARCH_SHOV_DOCS (default 100_000), NEXTSEARCH_SHOV_BATCH (256),
     NEXTSEARCH_SHOV_SECS (default 6), NEXTSEARCH_SHOV_MODE (fused|sparse),
     NEXTSEARCH_SHOV_DEPTH (pipeline depth, default 4).

MODE=sparse mirrors bench.py's 1M serving config (posting_block 64,
dense 1/1024 up to 7GB, K2=32) so the sharded number is directly
comparable to the headline; shapes are pinned through pin_shapes on
both indexes (the first-class API — no ad-hoc chunk probing here).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _measure(index, batches, batch, secs, depth=4):
    index.search_batch(batches[0], k=10)  # warm/compile
    n_done = 0
    i = 1
    window = []
    t0 = time.time()
    while True:
        window.append(index.search_batch_async(batches[i % len(batches)], k=10))
        if len(window) > depth:
            index.search_batch_gather(window.pop(0))
            n_done += batch
        i += 1
        if time.time() - t0 >= secs and n_done > 0:
            break
    while window:
        index.search_batch_gather(window.pop(0))
        n_done += batch
    return n_done / (time.time() - t0)


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_SHOV_DOCS", 100_000))
    vocab = int(os.environ.get("NEXTSEARCH_SHOV_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_SHOV_BATCH", 256))
    secs = float(os.environ.get("NEXTSEARCH_SHOV_SECS", 6))
    mode = os.environ.get("NEXTSEARCH_SHOV_MODE", "fused")
    depth = int(os.environ.get("NEXTSEARCH_SHOV_DEPTH", 4))

    import bench

    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.artifacts import load_artifact, save_artifact
    from nextsearch_tpu.index.segment import DeviceIndex
    from nextsearch_tpu.parallel.mesh import make_mesh
    from nextsearch_tpu.parallel.sharded import ShardedIndex

    cache_dir = os.path.join(
        "/tmp/nextsearch_bench_cache", f"{n_docs}_{vocab}_0"
    )
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()
    seg = load_artifact(cache_dir)
    if seg is None:
        seg, probs = bench.build_corpus(n_docs, vocab)
        save_artifact(seg, cache_dir)

    if mode == "sparse":
        cfg = EngineConfig(
            device=DeviceConfig(
                mode="sparse", posting_block=64, heavy_buckets=(512,),
                dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30,
                rescore_margin=32,
            )
        )
    else:
        cfg = EngineConfig(
            device=DeviceConfig(
                mode="fused", posting_block=512,
                chunk_buckets=(512, 1024, 4096), heavy_buckets=(512,),
            )
        )
    batches = bench.sample_queries(probs, n_queries=40 * batch, batch=batch)

    di = DeviceIndex([seg], config=cfg)
    if mode == "sparse":
        print(f"[shov] pins: {di.pin_shapes(batches)}", file=sys.stderr)
    qps_single = _measure(di, batches, batch, secs, depth=depth)
    print(f"[shov] DeviceIndex:        {qps_single:8.0f} qps", file=sys.stderr)

    # Free the single-device dense table before the sharded build: at 1M
    # sparse the table is ~6.4GB and two live copies would OOM the chip.
    del di
    import gc

    gc.collect()

    import jax

    mesh = make_mesh(dp=1, seg=1, devices=jax.devices()[:1])
    si = ShardedIndex([seg], mesh, config=cfg)
    if mode == "sparse":
        si.pin_shapes(batches)
    qps_sharded = _measure(si, batches, batch, secs, depth=depth)
    print(f"[shov] ShardedIndex (1,1): {qps_sharded:8.0f} qps", file=sys.stderr)

    overhead = (qps_single - qps_sharded) / qps_single * 100
    print(
        f"[shov] shard_map overhead at parity shapes: {overhead:.1f}%",
        file=sys.stderr,
    )
    import json

    print(json.dumps({
        "mode": mode,
        "docs": n_docs,
        "batch": batch,
        "qps_single": round(qps_single, 1),
        "qps_sharded_1x1": round(qps_sharded, 1),
        "overhead_pct": round(overhead, 1),
    }))


if __name__ == "__main__":
    main()
