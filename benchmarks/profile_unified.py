"""Unified-pipeline stage profiling AT THE SERVING OPERATING POINT.

Mirror of ops/bm25_sparse.bm25_search_sparse_unified with per-stage
toggles (same methodology as profile_serving.py for the packed path —
full-kernel variants, deltas vs "full" attribute each stage):

    full           the exact serving unified pipeline
    no_rescore     exact rescore off (candidates scored 1.0)
    no_cand        heavy_candidates off (selection gather + top-k)
    no_entries     entry expand+sort+pack off, kernel sees zero windows
                   (eoff = 0): measures the whole light-entry feed
    no_entry_sort  expansion runs, global sort skipped (entries fed
                   doc-unsorted; results wrong, timing only)
    no_kernel      unified_fused_pallas replaced by zeros (totals/smax/cnt)
    base           everything off (launch + plan transport floor)

Run on the real TPU:  python benchmarks/profile_unified.py
Env: NEXTSEARCH_PROF_DOCS (1000000), NEXTSEARCH_PROF_BATCH (512),
     NEXTSEARCH_PROF_BLOCK (64), NEXTSEARCH_PROF_VARIANTS (comma list).
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

from nextsearch_tpu.ops.bm25 import canonical_sort, expand_chunks  # noqa: E402
from nextsearch_tpu.ops.bm25_sparse import (  # noqa: E402
    _round_up_16,
    exact_rescore_v4,
    heavy_candidates,
)
from nextsearch_tpu.ops.heavy_pallas import (  # noqa: E402
    CSUB,
    ENT_G,
    ENT_W,
    TILE,
    gather_rows_pallas,
    unified_fused_pallas,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_slots", "K", "K2", "C", "block", "bs_steps", "nd", "nl", "U",
        "do_kernel", "do_entries", "do_entry_sort", "do_cand", "do_rescore",
    ),
)
def variant_unified(
    post_doc, post_score, dense_rows, light_bucket_pos, plan,
    *, n_slots, K, K2, C, block, bs_steps, nd, nl, U,
    do_kernel=True, do_entries=True, do_entry_sort=True, do_cand=True,
    do_rescore=True,
):
    """Keep in sync with ops/bm25_sparse.bm25_search_sparse_unified."""
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
    table3 = gather_rows_pallas(ids, dense_rows)
    table = table3.reshape(table3.shape[0], n_slots)

    n_tiles = n_slots // TILE
    N = C * block
    Np = ((N + ENT_W - 1) // ENT_W) * ENT_W + 2 * ENT_G * ENT_W
    nw = Np // ENT_W
    if do_entries:
        cs, cl, cq, cw = expand_chunks(
            starts, light_dfs, weights, C=C, block=block
        )
        P = post_doc.shape[0]
        offs = lax.broadcasted_iota(jnp.int32, (C, block), 1)
        valid = offs < cl[:, None]
        idx = jnp.clip(cs[:, None] + offs, 0, max(P - 1, 0))
        doc = jnp.where(valid, post_doc[idx], jnp.int32(n_slots))
        contrib = jnp.where(
            valid, cw[:, None] * post_score[idx], jnp.float32(0.0)
        )
        qrow = jnp.clip(jnp.broadcast_to(cq[:, None], (C, block)), 0, Q - 1)
        if do_entry_sort:
            qshift = max((Q - 1).bit_length(), 1)
            key = (
                doc.reshape(-1).astype(jnp.uint32) << qshift
            ) | qrow.reshape(-1).astype(jnp.uint32)
            skey, sv = lax.sort((key, contrib.reshape(-1)), num_keys=1)
            sd = (skey >> qshift).astype(jnp.int32)
            sq = (skey & jnp.uint32((1 << qshift) - 1)).astype(jnp.int32)
        else:
            sd, sq, sv = doc.reshape(-1), qrow.reshape(-1), contrib.reshape(-1)
        bounds = jnp.arange(0, n_tiles + 1, dtype=jnp.int32) * TILE
        eoff = jnp.searchsorted(sd, bounds, side="left").astype(jnp.int32)
        pad = Np - N
        sd = jnp.concatenate([sd, jnp.full((pad,), n_slots, jnp.int32)])
        sq = jnp.concatenate([sq, jnp.zeros((pad,), jnp.int32)])
        sv = jnp.concatenate([sv, jnp.zeros((pad,), jnp.float32)])
        ent_pack = jnp.concatenate(
            [
                sd.reshape(nw, 1, ENT_W),
                sq.reshape(nw, 1, ENT_W),
                lax.bitcast_convert_type(sv, jnp.int32).reshape(nw, 1, ENT_W),
                jnp.zeros((nw, 5, ENT_W), jnp.int32),
            ],
            axis=1,
        )
    else:
        ent_pack = jnp.full((nw, 8, ENT_W), n_slots, jnp.int32)
        eoff = jnp.zeros((n_tiles + 1,), jnp.int32)

    if do_kernel:
        totals, smax_sq, cnt_tq = unified_fused_pallas(
            mix.astype(table.dtype), table, ent_pack, eoff
        )
        found = jnp.sum(cnt_tq, axis=0).astype(jnp.int32)
    else:
        tiles_pad = ((n_tiles + 7) // 8) * 8
        sub_pad = tiles_pad * (TILE // CSUB)
        totals = jnp.zeros((Q, n_slots), jnp.float32)
        smax_sq = jnp.zeros((sub_pad, Q), jnp.float32)
        found = jnp.zeros((Q,), jnp.int32)

    if do_cand:
        _vals, cand = heavy_candidates(totals, smax_sq, K2, Q, n_slots)
        cand = jnp.where(cand >= n_slots, jnp.int32(2**30), cand)
    else:
        cand = jnp.full((Q, K2), 2**30, jnp.int32)

    safe_cand = jnp.clip(cand, 0, n_slots - 1)
    if do_rescore:
        # v3 retired; v4 with L2 = full lane width is the uncompacted
        # equivalent for this profile harness.
        exact = exact_rescore_v4(
            post_doc, post_score, dense_rows, light_bucket_pos, starts,
            slot_dense, slot_light, weights, safe_cand,
            bs_steps=bs_steps, nd=nd, nl=nl,
            L2=int(starts.shape[0] * starts.shape[1]),
        )
        exact = jnp.where(cand < n_slots, exact, jnp.float32(0.0))
    else:
        exact = jnp.where(cand < n_slots, 1.0, 0.0).astype(jnp.float32)
    sval, sdoc = canonical_sort(exact, safe_cand)

    out = jnp.concatenate(
        [sval[:, :K], sdoc[:, :K].astype(jnp.float32),
         found[:, None].astype(jnp.float32)],
        axis=1,
    )
    return out


VARIANTS = {
    "full": {},
    "no_rescore": {"do_rescore": False},
    "no_cand": {"do_cand": False},
    "no_entry_sort": {"do_entry_sort": False},
    "no_entries": {"do_entries": False, "do_entry_sort": False},
    "no_kernel": {"do_kernel": False},
    "base": {"do_kernel": False, "do_entries": False, "do_entry_sort": False,
             "do_cand": False, "do_rescore": False},
}


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    blk = int(os.environ.get("NEXTSEARCH_PROF_BLOCK", 64))
    heavy_b = int(os.environ.get("NEXTSEARCH_PROF_HEAVYB", 512))
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
            dense_df_ratio=1 / 1024, dense_max_bytes=7 << 30, unified=True,
        )
    )
    t0 = time.time()
    di = DeviceIndex([seg], config=cfg)
    print(f"[prof] index build+upload: {time.time()-t0:.0f}s", file=sys.stderr)
    batches = bench.sample_queries(probs, n_queries=20 * batch, batch=batch)
    pins = di.pin_shapes(batches)
    print(
        f"[prof] {n_docs} docs n_dense={di.n_dense} n_slots={di.n_slots} "
        f"pins={pins} bs_steps={di._bs_depth}",
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
            variant_unified,
            n_slots=di.n_slots, K=K, K2=K2, C=C, block=blk,
            bs_steps=di._bs_depth, nd=di.n_dense, nl=di.n_light,
            U=U, **kw,
        )

        def call(plan):
            pi, _u = plan
            return fn(di.post_doc, di.post_score, di.dense_rows,
                      di.light_bucket_pos, pi)

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

    print("\n=== unified serving-point stage attribution (ms/batch) ===")
    full = results.get("full")
    for name, ms in results.items():
        delta = f"  (full - this = {full - ms:+.1f})" if full and name != "full" else ""
        print(f"{name:14s} {ms:8.1f}{delta}")


if __name__ == "__main__":
    main()
