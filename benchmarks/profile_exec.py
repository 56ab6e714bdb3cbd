"""DEVICE-EXECUTION stage attribution via queued launches (relay-immune).

profile_serving.py times one launch per sample through the axon relay,
whose ~20-26 ms round trip carries +-3 ms jitter — large enough that its
per-stage marginals misled a whole optimization round (the segsum/lcount
scan marginals read +8.4/+5.9 ms; replacing both scans moved true serving
by ~1.3 ms). This harness queues N launches of each prof_skip variant with
a RESIDENT plan (no per-launch upload) and fetches only the last output,
so per-launch time is pure device execution with transport noise / N:
measured variance ~0.1 ms at N=10 vs +-3 ms single-launch.

Run on the real TPU:  python benchmarks/profile_exec.py
Env: NEXTSEARCH_PROF_DOCS/VOCAB/BATCH/BLOCK/HEAVYB/K2 as profile_serving,
     NEXTSEARCH_PROF_VARIANTS (comma list), NEXTSEARCH_PROF_N (10).
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

from nextsearch_tpu.ops.bm25_sparse import bm25_search_sparse_packed  # noqa: E402
from profile_serving import VARIANTS  # noqa: E402


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    blk = int(os.environ.get("NEXTSEARCH_PROF_BLOCK", 64))
    heavy_b = int(os.environ.get("NEXTSEARCH_PROF_HEAVYB", 512))
    margin = int(os.environ.get("NEXTSEARCH_PROF_K2", 32))
    nq_launch = int(os.environ.get("NEXTSEARCH_PROF_N", 10))
    names = os.environ.get("NEXTSEARCH_PROF_VARIANTS")
    names = names.split(",") if names else list(VARIANTS)

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
            rescore_margin=margin,
        )
    )
    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    print(f"[exec] index build+upload: {time.time()-t0:.0f}s", file=sys.stderr)
    batches = bench.sample_queries(probs, n_queries=20 * batch, batch=batch)
    di.pin_shapes(batches)
    qs, _f = di._shortcut_single_heavy(batches[0], 10)
    plan_np, U = di.plan_sparse(qs)
    C = di._chunk_budget(plan_np[1], blk)
    L2 = di._light_budget(plan_np)
    H2 = di._heavy_budget(plan_np)
    K = 16
    K2 = min(max(2 * K, margin), di.n_slots)
    w_max = di._sel_window(plan_np[1])
    plan_dev = jax.device_put(plan_np)
    plan_dev.block_until_ready()
    print(
        f"[exec] C={C} L2={L2} H2={H2} U={U} K2={K2} w_max={w_max} "
        f"N={nq_launch}",
        file=sys.stderr,
    )

    results = {}
    for name in names:
        skip = VARIANTS[name]
        fast = name != "wide"

        def call():
            return bm25_search_sparse_packed(
                di.post_doc, di.post_score, di.dense_rows,
                di.bucket_pos, di.light_bucket_pos, plan_dev,
                n_slots=di.n_slots, K=K, K2=K2, C=C, block=blk,
                bs_steps=di._bs_depth, nd=di.n_dense, nl=di.n_light,
                U=U, use_pallas=True, use_compact=True,
                heavy_direct=di._heavy_direct, fast_heavy=fast,
                w_max=w_max, L2=L2, H2=H2, prof_skip=skip,
            )

        t0 = time.time()
        jax.device_get(call())
        print(f"[exec] {name}: compile {time.time()-t0:.0f}s", file=sys.stderr)
        samples = []
        for _rep in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(nq_launch):
                out = call()
            jax.device_get(out)
            samples.append(
                (time.perf_counter() - t0) / nq_launch * 1000
            )
        ms = float(np.median(samples))
        results[name] = ms
        print(
            f"[exec] {name}: {ms:.2f} ms/launch exec "
            f"({batch/ms*1000:.0f} qps)",
            file=sys.stderr,
        )

    print("\n=== device-exec stage attribution (ms/launch) ===")
    full = results.get("full")
    for name, ms in results.items():
        delta = (
            f"  (full - this = {full - ms:+.2f})"
            if full and name != "full" else ""
        )
        print(f"{name:14s} {ms:8.2f}{delta}")


if __name__ == "__main__":
    main()
