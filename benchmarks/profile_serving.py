"""Sparse-kernel stage profiling AT THE SERVING OPERATING POINT.

Times the PRODUCTION kernel (ops/bm25_sparse._packed_impl) with one stage
disabled at a time via its prof_skip static arg — no mirrored copy of the
pipeline to drift out of sync (the previous version of this file mirrored
the pre-fast-path pipeline and its numbers stopped describing serving).
Stage cost = full - variant. The serving configuration is bench.py's:
posting block 64, compact heavy (Pallas DMA row gather, U pinned at 512),
fast_heavy guarded pipeline (1-pass DEFAULT heavy matmul, merged K2 pool).

Variants:
    full           the exact serving kernel configuration (fast path)
    wide           fast_heavy=False (the relaunch kernel: HIGHEST + 2*K2)
    no_rescore     skip the exact rescore
    no_sort2       skip per_query_topk_flat (light selection sort)
    no_light       skip the whole light chain (expand+sort+segsum+sort2)
    no_hgather     light totals but H values gathered as zeros
    no_cand_heavy  skip heavy_candidates (sub-tile top-k + H gather)
    no_rowgather   compact DMA row gather replaced by a zero table
    no_heavy_mm    skip gather + fused matmul (H = zeros)
    base           everything off (launch + plan transport + mix floor)

Run on the real TPU:  python benchmarks/profile_serving.py
Env: NEXTSEARCH_PROF_DOCS (1000000), NEXTSEARCH_PROF_BATCH (512),
     NEXTSEARCH_PROF_BLOCK (64), NEXTSEARCH_PROF_HEAVYB (512),
     NEXTSEARCH_PROF_K2 (32), NEXTSEARCH_PROF_VARIANTS (comma list),
     NEXTSEARCH_PROF_GROUPS (1; >1 profiles the multi-launch kernel with
     G barrier-chained sub-batches of NEXTSEARCH_PROF_BATCH queries each —
     per-group stage attribution of the G-launch amortization).
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

from nextsearch_tpu.ops.bm25_sparse import (  # noqa: E402
    bm25_search_sparse_packed,
    bm25_search_sparse_packed_multi,
)

VARIANTS = {
    "full": (),
    "wide": (),
    "no_rescore": ("rescore",),
    "no_sort2": ("sort2",),
    "no_lsort": ("lsort",),
    "no_hgather": ("hgather",),
    "no_light": ("light", "hgather", "sort2"),
    "no_cand_heavy": ("cand_heavy",),
    "no_rowgather": ("rowgather",),
    "no_heavy_mm": ("heavy_mm", "rowgather"),
    "no_s2hg": ("sort2", "hgather"),
    "no_segsum": ("segsum",),
    "no_lcount": ("lcount",),
    "no_seg_lc": ("segsum", "lcount"),
    # light chain + base alone (heavy stages all off): in-context light
    # cost without the heavy kernel competing for the scheduler
    "light_only": ("rowgather", "heavy_mm", "cand_heavy", "rescore"),
    # heavy stages + base alone
    "heavy_only": ("light", "hgather", "sort2", "rescore"),
    "base": ("heavy_mm", "rowgather", "light", "hgather", "sort2",
             "cand_heavy", "rescore"),
}


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    blk = int(os.environ.get("NEXTSEARCH_PROF_BLOCK", 64))
    heavy_b = int(os.environ.get("NEXTSEARCH_PROF_HEAVYB", 512))
    margin = int(os.environ.get("NEXTSEARCH_PROF_K2", 32))
    use_pallas = jax.default_backend() == "tpu"
    names = os.environ.get("NEXTSEARCH_PROF_VARIANTS")
    names = names.split(",") if names else list(VARIANTS)

    import bench

    from nextsearch_tpu.config import DeviceConfig, EngineConfig
    from nextsearch_tpu.index.artifacts import load_artifact, save_artifact

    cache_dir = os.path.join(
        "/tmp/nextsearch_bench_cache", f"{n_docs}_{vocab}_0"
    )
    probs = 1.0 / np.arange(1, vocab + 1) ** 1.07
    probs /= probs.sum()
    seg = load_artifact(cache_dir)
    if seg is None:
        t0 = time.time()
        seg, probs = bench.build_corpus(n_docs, vocab)
        save_artifact(seg, cache_dir)
        print(f"[prof] corpus built {time.time()-t0:.0f}s", file=sys.stderr)

    from nextsearch_tpu.index.segment import DeviceIndex

    cfg = EngineConfig(
        device=DeviceConfig(
            mode="sparse", posting_block=blk, heavy_buckets=(heavy_b,),
            dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30,
            rescore_margin=margin,
        )
    )
    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    print(f"[prof] index build+upload: {time.time()-t0:.0f}s", file=sys.stderr)
    batches = bench.sample_queries(probs, n_queries=20 * batch, batch=batch)
    pins = di.pin_shapes(batches)
    print(
        f"[prof] {n_docs} docs n_dense={di.n_dense} n_slots={di.n_slots} "
        f"pins={pins} bs_steps={di._bs_depth} pallas={use_pallas}",
        file=sys.stderr,
    )

    groups = int(os.environ.get("NEXTSEARCH_PROF_GROUPS", 1))
    # Serving strips 1-term head-heavy/light queries host-side BEFORE
    # planning (the row/posting top-k shortcuts); without this the chunk
    # budget inflates past the serving pin (measured: C 3072 -> 5376).
    plans = [
        di.plan_sparse(di._shortcut_single_heavy(b, 10)[0]) for b in batches
    ]
    K = 10
    K2 = min(max(2 * K, margin), di.n_slots)
    C = max(di._chunk_budget(p[0][1], blk) for p in plans)
    L2 = max(di._light_budget(p[0]) for p in plans)
    H2 = max(di._heavy_budget(p[0]) for p in plans)
    U = plans[0][1]
    T = plans[0][0].shape[2]
    print(f"[prof] C={C} L2={L2} H2={H2} U={U} T={T} K2={K2} G={groups}",
          file=sys.stderr)
    if groups > 1:
        # Stack G single-group plans into multi-launch blocks; per-"batch"
        # numbers below are then per G*batch queries.
        plans = [
            (np.stack([plans[i + g][0] for g in range(groups)]), U)
            for i in range(0, len(plans) - groups + 1, groups)
        ]

    results = {}
    for name in names:
        skip = VARIANTS[name]
        fast = name != "wide"

        def call(plan):
            pi, _u = plan
            kern = (
                bm25_search_sparse_packed_multi
                if groups > 1
                else bm25_search_sparse_packed
            )
            out = kern(
                di.post_doc, di.post_score, di.dense_rows,
                di.bucket_pos, di.light_bucket_pos, pi,
                n_slots=di.n_slots, K=K, K2=K2, C=C, block=blk,
                bs_steps=di._bs_depth, nd=di.n_dense, nl=di.n_light,
                U=U, use_pallas=use_pallas, use_compact=True,
                heavy_direct=di._heavy_direct,
                fast_heavy=fast,
                w_max=di._sel_window(pi[:, 1] if groups > 1 else pi[1]),
                L2=L2, H2=H2,
                prof_skip=skip,
            )
            out.copy_to_host_async()
            return out

        t0 = time.time()
        jax.device_get(call(plans[0]))
        print(f"[prof] {name}: compile {time.time()-t0:.0f}s", file=sys.stderr)
        times = []
        h = call(plans[1])
        t0 = time.time()
        for i in range(2, 14):
            h2 = call(plans[i % len(plans)])
            jax.device_get(h)
            times.append(time.time() - t0)
            t0 = time.time()
            h = h2
        jax.device_get(h)
        ms = float(np.median(times)) * 1000
        results[name] = ms
        print(f"[prof] {name}: {ms:.1f} ms/batch "
              f"({batch/ms*1000:.0f} qps)", file=sys.stderr)

    print("\n=== serving-point stage attribution (ms/batch) ===")
    full = results.get("full")
    for name, ms in results.items():
        delta = f"  (full - this = {full - ms:+.1f})" if full and name != "full" else ""
        print(f"{name:14s} {ms:8.1f}{delta}")


if __name__ == "__main__":
    main()
