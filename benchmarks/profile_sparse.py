"""Sparse-kernel stage profiling at 1M docs via FULL-kernel variants.

Same methodology as profile_1m.py (isolated sub-programs hit a compile
pathology through the remote-compile relay, so stages are attributed by
timing complete kernel variants that each drop one stage). Variants toggle
the sparse pipeline's stages (ops/bm25_sparse.py): heavy fused matmul,
light sort+segsum, the H gather feeding exact `found`, the per-tile heavy
candidate extraction, and the exact rescore.

Run on the real TPU:  python benchmarks/profile_sparse.py
Env: NEXTSEARCH_PROF_DOCS (default 1_000_000), NEXTSEARCH_PROF_BATCH (512),
     NEXTSEARCH_PROF_VARIANTS (comma list; default all),
     NEXTSEARCH_PROF_DENSE (ratio, default 1/1024),
     NEXTSEARCH_PROF_DENSE_BYTES (default 7GB — bench parity),
     NEXTSEARCH_PROF_PALLAS (1).
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
    exact_rescore_v2,
    heavy_candidates,
    light_totals,
    per_query_counts,
    per_query_topk_flat,
)
from nextsearch_tpu.ops.heavy_pallas import (  # noqa: E402
    heavy_fused_pallas,
    heavy_fused_xla,
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_slots", "K", "K2", "C", "block", "bs_steps", "nd", "nl", "U",
        "use_pallas",
        "do_heavy", "do_light", "do_hgather", "do_cand_heavy", "do_rescore",
    ),
)
def variant_kernel(
    post_doc, post_score, dense_rows, bucket_pos, light_bucket_pos,
    plan,
    *, n_slots, K, K2, C, block, bs_steps, nd, nl, U, use_pallas,
    do_heavy=True, do_light=True, do_hgather=True, do_cand_heavy=True,
    do_rescore=True,
):
    starts = plan[0]
    light_dfs = plan[1]
    slot_dense = plan[2]
    slot_light = plan[3]
    weights = lax.bitcast_convert_type(plan[5], jnp.float32)
    Q, T = starts.shape

    nd1 = dense_rows.shape[0]
    dense2 = dense_rows.reshape(nd1, n_slots)
    iota_nd = lax.broadcasted_iota(jnp.int32, (1, nd1), 1)

    def mix_step(t, m):
        sd_t = lax.dynamic_index_in_dim(slot_dense, t, axis=1, keepdims=True)
        w_t = lax.dynamic_index_in_dim(weights, t, axis=1, keepdims=True)
        return m + jnp.where(sd_t == iota_nd, w_t, jnp.float32(0.0))

    mix = lax.fori_loop(0, T, mix_step, jnp.zeros((Q, nd1), jnp.float32))
    mix = mix.at[:, nd].set(0.0)

    if do_heavy:
        fused = heavy_fused_pallas if use_pallas else heavy_fused_xla
        H, smax_sq, cnt_tq = fused(mix, dense2)
        heavy_found = jnp.sum(cnt_tq, axis=0).astype(jnp.int32)
    else:
        n_sub_pad = -(-n_slots // 512)
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
        sel_score = jnp.where(valid_last, stot + hval, jnp.float32(0.0))
        ldocs, _lvals = per_query_topk_flat(
            sq, sel_score, sd, Q, K2, jnp.int32(2**30)
        )
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
        exact = exact_rescore_v2(
            post_doc, post_score, bucket_pos, light_bucket_pos, starts,
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
    "no_hgather": {"do_hgather": False},
    "no_cand_heavy": {"do_cand_heavy": False},
    "no_light": {"do_light": False, "do_hgather": False},
    "no_heavy": {"do_heavy": False, "do_cand_heavy": False},
    "base": {"do_heavy": False, "do_light": False, "do_hgather": False,
             "do_cand_heavy": False, "do_rescore": False},
}


def main():
    n_docs = int(os.environ.get("NEXTSEARCH_PROF_DOCS", 1_000_000))
    vocab = int(os.environ.get("NEXTSEARCH_PROF_VOCAB", 200_000))
    batch = int(os.environ.get("NEXTSEARCH_PROF_BATCH", 512))
    dense_bytes = int(
        os.environ.get("NEXTSEARCH_PROF_DENSE_BYTES", 7 << 30)
    )
    dense_ratio = float(os.environ.get("NEXTSEARCH_PROF_DENSE", 1 / 256))
    use_pallas = os.environ.get("NEXTSEARCH_PROF_PALLAS", "1") == "1" and (
        jax.default_backend() == "tpu"
    )
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
        t0 = time.time()
        seg, probs = bench.build_corpus(n_docs, vocab)
        save_artifact(seg, cache_dir)
        print(f"[prof] corpus built {time.time()-t0:.0f}s", file=sys.stderr)

    blk = 512
    cfg = EngineConfig(
        device=DeviceConfig(
            mode="sparse", posting_block=blk,
            dense_df_ratio=dense_ratio, dense_max_bytes=dense_bytes,
        )
    )
    di = DeviceIndex([seg], config=cfg)
    print(
        f"[prof] {n_docs} docs {seg.num_postings} postings "
        f"n_dense={di.n_dense} n_slots={di.n_slots} pallas={use_pallas}",
        file=sys.stderr,
    )
    batches = bench.sample_queries(probs, n_queries=20 * batch, batch=batch)

    block = cfg.device.posting_block
    max_live = 1
    plans = []
    for b in batches:
        pi, U = di.plan_sparse(b)
        live = int(np.sum((pi[1].astype(np.int64) + block - 1) // block))
        max_live = max(max_live, live)
        plans.append((pi, U))
    C = ((max_live + 127) // 128) * 128
    K = 10
    K2 = 32
    bs_steps = di._bs_depth
    print(f"[prof] C={C} T={plans[0][0].shape[2]} bs_steps={bs_steps}",
          file=sys.stderr)

    results = {}
    for name in names:
        kw = VARIANTS[name]
        fn = functools.partial(
            variant_kernel,
            n_slots=di.n_slots, K=K, K2=K2, C=C, block=block,
            bs_steps=bs_steps, nd=di.n_dense, nl=di.n_light,
            use_pallas=use_pallas, **kw,
        )
        def call(plan):
            pi, u = plan
            return fn(di.post_doc, di.post_score, di.dense_rows,
                      di.bucket_pos, di.light_bucket_pos, pi, U=0)

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

    print("\n=== sparse stage attribution (ms/batch) ===")
    full = results.get("full")
    for name, ms in results.items():
        delta = f"  (full - this = {full - ms:+.1f})" if full and name != "full" else ""
        print(f"{name:14s} {ms:8.1f}{delta}")


if __name__ == "__main__":
    main()
