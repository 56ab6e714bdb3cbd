"""Kernel-stage profiling at 1M docs via FULL-kernel variants.

Isolated sub-programs of the fused kernel hit an XLA compile pathology
through the remote-compile relay (STATUS r1), so stages are attributed by
timing complete kernel variants that each drop one stage. All variants share
the driver's corpus cache and run the same batch stream.

Run on the real TPU:  python benchmarks/profile_1m.py
Env: NEXTSEARCH_PROF_DOCS (default 1_000_000), NEXTSEARCH_PROF_BATCH (512),
     NEXTSEARCH_PROF_VARIANTS (comma list; default all).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nextsearch_tpu.ops.bm25 import (  # noqa: E402
    canonical_sort,
    exact_rescore,
    expand_chunks,
    heavy_scores,
    scatter_scores,
    tiled_topk,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_slots", "K", "K2", "C", "block", "bs_steps", "scores_bf16",
        "do_scatter", "do_heavy", "do_found", "topk", "do_rescore",
    ),
)
def variant_kernel(
    post_doc, post_score, dense_rows, plan_ints, plan_f32,
    *, n_slots, K, K2, C, block, bs_steps, scores_bf16,
    do_scatter=True, do_heavy=True, do_found=True, topk="tiled",
    do_rescore=True,
):
    starts = plan_ints[0]
    dfs = plan_ints[1]
    light_dfs = plan_ints[2]
    Q, T = starts.shape
    weights = plan_f32[:Q, :T]
    heavy_mix = plan_f32[:Q, T:]
    unique_heavy = plan_f32[Q, T:].astype(jnp.int32)
    sdtype = jnp.bfloat16 if scores_bf16 else jnp.float32

    scores = jnp.zeros((Q, n_slots), sdtype)
    if do_scatter:
        cs, cl, cq, cw = expand_chunks(
            starts, light_dfs, weights, C=C, block=block
        )
        scores = scatter_scores(
            post_doc, post_score, cs, cl, cq, cw,
            Q=Q, n_slots=n_slots, block=block, dtype=sdtype,
        )
    if do_heavy:
        scores = scores + heavy_scores(
            dense_rows, unique_heavy, heavy_mix, dtype=sdtype
        )
    if do_found:
        found = jnp.sum(scores > 0, axis=1, dtype=jnp.int32)
    else:
        found = jnp.zeros((Q,), jnp.int32)
    k2 = min(K2, n_slots)
    if topk == "tiled":
        _fv, cand = tiled_topk(scores, k2)
    elif topk == "plain":
        _fv, cand = jax.lax.top_k(scores, k2)
        cand = cand.astype(jnp.int32)
    else:  # none: fixed fake candidates, keeps downstream shapes
        cand = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.int32, (1, k2), 1), (Q, k2)
        )
    if do_rescore:
        exact = exact_rescore(
            post_doc, post_score, starts, dfs, weights,
            cand.astype(jnp.int32), bs_steps=bs_steps,
        )
        sval, sdoc = canonical_sort(exact, cand.astype(jnp.int32))
    else:
        sval = jnp.zeros((Q, k2), jnp.float32) + found[:, None].astype(jnp.float32) * 0
        sdoc = cand
    out = jnp.concatenate(
        [sval[:, :K], sdoc[:, :K].astype(jnp.float32),
         found[:, None].astype(jnp.float32)],
        axis=1,
    )
    return out


VARIANTS = {
    # name: stage-toggle overrides
    "full": {},
    "no_rescore": {"do_rescore": False},
    "no_topk": {"topk": "none", "do_rescore": False},
    "plain_topk": {"topk": "plain"},
    "no_found": {"do_found": False},
    "no_scatter": {"do_scatter": False},
    "no_heavy": {"do_heavy": False},
    "base": {"do_scatter": False, "do_heavy": False, "do_found": False,
             "topk": "none", "do_rescore": False},
}


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    names = os.environ.get("NEXTSEARCH_PROF_VARIANTS")
    names = names.split(",") if names else list(VARIANTS)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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
        t0 = time.time()
        seg, probs = bench.build_corpus(n_docs, vocab)
        save_artifact(seg, cache_dir)
        print(f"[prof] corpus built {time.time()-t0:.0f}s", file=sys.stderr)

    blk = 512
    cfg = EngineConfig(
        device=DeviceConfig(
            mode="fused", posting_block=blk, heavy_buckets=(512,),
            dense_df_ratio=1 / 256, dense_max_bytes=2 << 30,
            scores_bf16=os.environ.get("NEXTSEARCH_PROF_BF16", "1") == "1",
        )
    )
    di = DeviceIndex([seg], config=cfg)
    print(
        f"[prof] {n_docs} docs {seg.num_postings} postings "
        f"n_dense={di.n_dense} n_slots={di.n_slots}",
        file=sys.stderr,
    )
    batches = bench.sample_queries(probs, n_queries=20 * batch, batch=batch)

    # Shared plan shapes (single compiled shape across variants).
    block = cfg.device.posting_block
    max_live = 1
    plans = []
    for b in batches:
        s, d, w, ld, uh, hm = di.plan_full(b)
        live = int(np.sum((ld.astype(np.int64) + block - 1) // block))
        max_live = max(max_live, live)
        plans.append((s, d, w, ld, uh, hm))
    C = ((max_live + 127) // 128) * 128
    K, K2 = 10, 32
    bs_steps = max(2, di.n_slots.bit_length() + 1)
    print(f"[prof] C={C} T={plans[0][0].shape[1]} U={plans[0][4].shape[0]}",
          file=sys.stderr)

    packed = []
    for s, d, w, ld, uh, hm in plans:
        Qb, T = s.shape
        U = uh.shape[0]
        pi = np.stack([s, d, ld])
        pf = np.zeros((Qb + 1, T + U), np.float32)
        pf[:Qb, :T] = w
        pf[:Qb, T:] = hm
        pf[Qb, T:] = uh.astype(np.float32)
        packed.append((pi, pf))

    results = {}
    for name in names:
        kw = VARIANTS[name]
        fn = functools.partial(
            variant_kernel,
            n_slots=di.n_slots, K=K, K2=K2, C=C, block=block,
            bs_steps=bs_steps, scores_bf16=cfg.device.scores_bf16, **kw,
        )
        t0 = time.time()
        jax.device_get(fn(di.post_doc, di.post_score, di.dense_rows,
                          *packed[0]))
        print(f"[prof] {name}: compile {time.time()-t0:.0f}s", file=sys.stderr)
        # depth-2 pipeline, 12 timed launches
        times = []
        h = fn(di.post_doc, di.post_score, di.dense_rows, *packed[1])
        t0 = time.time()
        for i in range(2, 14):
            h2 = fn(di.post_doc, di.post_score, di.dense_rows,
                    *packed[i % len(packed)])
            jax.device_get(h)
            times.append(time.time() - t0)
            t0 = time.time()
            h = h2
        jax.device_get(h)
        ms = float(np.median(times)) * 1000
        results[name] = ms
        print(f"[prof] {name}: {ms:.1f} ms/batch "
              f"({batch/ms*1000:.0f} qps)", file=sys.stderr)

    print("\n=== stage attribution (ms/batch) ===")
    full = results.get("full")
    for name, ms in results.items():
        delta = f"  (full - this = {full - ms:+.1f})" if full and name != "full" else ""
        print(f"{name:12s} {ms:8.1f}{delta}")


if __name__ == "__main__":
    main()
