"""Sparse-kernel stage profiling AT THE SERVING OPERATING POINT.

profile_sparse.py measures the full-table heavy path at posting block 512;
the serving configuration (bench.py defaults) is posting block 64 + compact
heavy mode (Pallas DMA row gather, U pinned at 512). Stage costs shift a
lot between the two, so round-3 optimization decisions are driven by THIS
harness: full-kernel variants that each drop one stage (isolated
sub-programs hit a compile pathology through the remote-compile relay).

Variants (deltas vs "full" attribute each stage):
    full           the exact serving kernel configuration
    no_rescore     skip exact_rescore_v2 (candidates scored 1.0)
    no_sort2       skip per_query_topk_flat (light selection sort)
    no_light       skip light_totals entirely (sort1+segsum+sort2+found)
    no_hgather     light totals but H gathered as zeros
    no_cand_heavy  skip heavy_candidates (tile top-k + gather)
    no_heavy_mm    skip compact gather + fused matmul (H = zeros)
    base           everything off (launch + plan transport floor)

Run on the real TPU:  python benchmarks/profile_serving.py
Env: NEXTSEARCH_PROF_DOCS (1000000), NEXTSEARCH_PROF_BATCH (512),
     NEXTSEARCH_PROF_BLOCK (64), NEXTSEARCH_PROF_HEAVYB (512),
     NEXTSEARCH_PROF_VARIANTS (comma list).
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
from jax import lax  # noqa: E402

from nextsearch_tpu.ops.bm25 import canonical_sort  # noqa: E402
from nextsearch_tpu.ops.bm25_sparse import (  # noqa: E402
    _dedup_sorted,
    _round_up_16,
    exact_rescore_v3,
    heavy_candidates,
    light_totals,
    per_query_counts,
    per_query_topk_flat,
)
from nextsearch_tpu.ops.heavy_pallas import (  # noqa: E402
    gather_rows_pallas,
    heavy_fused_pallas,
    heavy_fused_xla,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_slots", "K", "K2", "C", "block", "bs_steps", "nd", "nl", "U",
        "use_pallas",
        "do_heavy", "do_light", "do_sort2", "do_hgather", "do_cand_heavy",
        "do_rescore",
    ),
)
def variant_kernel(
    post_doc, post_score, dense_rows, bucket_pos, light_bucket_pos,
    plan,
    *, n_slots, K, K2, C, block, bs_steps, nd, nl, U, use_pallas,
    do_heavy=True, do_light=True, do_sort2=True, do_hgather=True,
    do_cand_heavy=True, do_rescore=True,
):
    """Mirror of bm25_search_sparse_packed (compact heavy path) with
    per-stage toggles. Keep in sync with ops/bm25_sparse.py."""
    starts = plan[0]
    light_dfs = plan[1]
    slot_dense = plan[2]
    slot_light = plan[3]
    slot_compact = plan[4]
    weights = lax.bitcast_convert_type(plan[5], jnp.float32)
    Q, T = starts.shape

    m = min(U, Q * T)
    ids_flat = plan[6].reshape(-1)[:m]
    uc = _round_up_16(U + 1)
    ids = jnp.concatenate([ids_flat, jnp.full((uc - m,), nd, jnp.int32)])
    ids = jnp.clip(ids, 0, dense_rows.shape[0] - 1)
    iota_u = lax.broadcasted_iota(jnp.int32, (1, uc), 1)

    def mix_step(t, mm):
        sc_t = lax.dynamic_index_in_dim(slot_compact, t, axis=1, keepdims=True)
        w_t = lax.dynamic_index_in_dim(weights, t, axis=1, keepdims=True)
        return mm + jnp.where(sc_t == iota_u, w_t, jnp.float32(0.0))

    mix = lax.fori_loop(0, T, mix_step, jnp.zeros((Q, uc), jnp.float32))
    mix = mix.at[:, U].set(0.0)

    if do_heavy:
        table3 = (
            gather_rows_pallas(ids, dense_rows)
            if use_pallas
            else dense_rows[ids]
        )
        table = table3.reshape(table3.shape[0], n_slots)
        fused = heavy_fused_pallas if use_pallas else heavy_fused_xla
        H, smax_sq, cnt_tq = fused(mix, table)
        heavy_found = jnp.sum(cnt_tq, axis=0).astype(jnp.int32)
    else:
        from nextsearch_tpu.ops.heavy_pallas import CSUB

        n_sub_pad = -(-n_slots // CSUB)
        H = jnp.zeros((Q, n_slots), jnp.float32)
        smax_sq = jnp.zeros((n_sub_pad, Q), jnp.float32)
        heavy_found = jnp.zeros((Q,), jnp.int32)

    if do_light:
        sq, sd, stot, last = light_totals(
            post_doc, post_score, starts, light_dfs, weights,
            C=C, block=block, Q=Q, n_slots=n_slots,
        )
        sd_clip = jnp.clip(sd, 0, n_slots - 1)
        if do_hgather:
            hval = H[jnp.clip(sq, 0, Q - 1), sd_clip].astype(jnp.float32)
        else:
            hval = jnp.zeros(sq.shape, jnp.float32)
        valid_last = last & (sq < Q)
        light_only = valid_last & (hval == 0.0)
        found = heavy_found + per_query_counts(sq, light_only, Q)
        if do_sort2:
            sel_score = jnp.where(valid_last, stot + hval, jnp.float32(0.0))
            ldocs, _lvals = per_query_topk_flat(
                sq, sel_score, sd, Q, K2, jnp.int32(2**30)
            )
        else:
            ldocs = jnp.full((Q, K2), 2**30, jnp.int32)
    else:
        found = heavy_found
        ldocs = jnp.full((Q, K2), 2**30, jnp.int32)

    if do_cand_heavy:
        hvals, hdocs = heavy_candidates(H, smax_sq, K2, Q, n_slots)
    else:
        hdocs = jnp.full((Q, K2), 2**30, jnp.int32)

    cand = jnp.concatenate([ldocs, hdocs], axis=1)
    cand = jnp.where(cand >= n_slots, jnp.int32(2**30), cand)

    safe_cand = jnp.clip(cand, 0, n_slots - 1)
    if do_rescore:
        exact = exact_rescore_v3(
            post_doc, post_score, dense_rows, light_bucket_pos, starts,
            slot_dense, slot_light, weights, safe_cand,
            bs_steps=bs_steps, nd=nd, nl=nl,
        )
        exact = jnp.where(cand < n_slots, exact, jnp.float32(0.0))
    else:
        exact = jnp.where(cand < n_slots, 1.0, 0.0).astype(jnp.float32)
    sval, sdoc = canonical_sort(exact, safe_cand)
    sval, sdoc = _dedup_sorted(sval, sdoc)

    out = jnp.concatenate(
        [sval[:, :K], sdoc[:, :K].astype(jnp.float32),
         found[:, None].astype(jnp.float32)],
        axis=1,
    )
    return out


VARIANTS = {
    "full": {},
    "no_rescore": {"do_rescore": False},
    "no_sort2": {"do_sort2": False},
    "no_hgather": {"do_hgather": False},
    "no_light": {"do_light": False, "do_hgather": False, "do_sort2": False},
    "no_cand_heavy": {"do_cand_heavy": False},
    "no_heavy_mm": {"do_heavy": False},
    "base": {"do_heavy": False, "do_light": False, "do_hgather": False,
             "do_sort2": False, "do_cand_heavy": False, "do_rescore": False},
}


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    blk = int(os.environ.get("NEXTSEARCH_PROF_BLOCK", 64))
    heavy_b = int(os.environ.get("NEXTSEARCH_PROF_HEAVYB", 512))
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

    plans = [di.plan_sparse(b) for b in batches]
    K = 10
    K2 = 32
    C = di._chunk_budget(plans[0][0][1], blk)
    U = plans[0][1]
    print(f"[prof] C={C} U={U} T={plans[0][0].shape[2]}", file=sys.stderr)

    results = {}
    for name in names:
        kw = VARIANTS[name]
        fn = functools.partial(
            variant_kernel,
            n_slots=di.n_slots, K=K, K2=K2, C=C, block=blk,
            bs_steps=di._bs_depth, nd=di.n_dense, nl=di.n_light,
            use_pallas=use_pallas, U=U, **kw,
        )

        def call(plan):
            pi, _u = plan
            return fn(di.post_doc, di.post_score, di.dense_rows,
                      di.bucket_pos, di.light_bucket_pos, pi)

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
