"""Micro-probe: where does heavy candidate extraction spend its 7.5 ms?

heavy_candidates (ops/bm25_sparse.py) is three device steps at the 1M
serving point (Q=512, n_sub=8448 padded, K2=32, CSUB=128):

    topk_smax   lax.top_k over smax [Q, n_sub]           -> top-32 sub-tiles
    gather      take_along_axis of [Q, n_sub, CSUB] H     -> [Q, 32*128]
    topk_flat   lax.top_k over the gathered [Q, 4096]     -> top-32 docs

and the fused-kernel matmul that produces H. This probe times each step
standalone (and a couple of replacement strategies) so the attack order is
measured, not guessed. Also times heavy_fused_pallas at alternative grid
TILE sizes — the per-tile overhead hypothesis for the matmul's 8.2 ms vs
its ~3.9 ms HBM roofline.

Run on the real TPU: python benchmarks/probe_candsel.py

Measured 2026-08-19 (v5e via relay, minus the 30.6 ms depth-1 launch
floor): topk_smax ~0 / H sub-tile gather 6.8 ms / topk_flat 2.7 ms /
heavy_candidates total 7.4 ms. The gather is COUNT-bound, not
volume-bound: 32x32-doc blocks (4x less volume, same 16,384-row count)
measured 12.6 ms — hierarchical narrowing is a dead end. Fused matmul:
TILE=2048 11.6 / 4096 10.8 / 8192 11.0 ms on a 384-row bf16 table;
16384 exceeds the 100MB VMEM budget (scoped OOM at compile).
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
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402


def timeit(name, fn, *args, n=12):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
    # device_get-based timing only (block_until_ready unreliable on axon)
    h = c(*args)
    times = []
    t0 = time.time()
    for _ in range(n):
        h2 = c(*args)
        jax.device_get(jax.tree.leaves(h)[0].ravel()[:8])
        times.append(time.time() - t0)
        t0 = time.time()
        h = h2
    jax.device_get(jax.tree.leaves(h)[0].ravel()[:8])
    ms = float(np.median(times)) * 1000
    print(f"{name:34s} {ms:8.2f} ms")
    return ms


def main():
    Q = 512
    n_slots = 999424  # ~1M, multiple of 16384 so the TILE sweep divides
    n_sub = n_slots // 128
    sub_pad = ((n_slots // 2048 + 7) // 8) * 8 * 16
    K2 = 32
    r = np.random.default_rng(0)

    H = jnp.asarray(r.random((Q, n_slots), np.float32))
    smax = jnp.asarray(r.random((sub_pad, Q), np.float32))
    jax.block_until_ready((H, smax))
    print(f"[probe] Q={Q} n_slots={n_slots} n_sub={n_sub} sub_pad={sub_pad}")

    # Null launch: every timing below includes this depth-1 pipeline
    # round-trip floor — subtract it to get device-kernel cost.
    timeit("null launch (floor)", lambda x: x[:8, :8] + 1.0, smax)

    # --- step 1: top-K2 sub-tiles from smax
    def topk_smax(smax):
        sm = jnp.transpose(smax)[:, :n_sub]
        _v, tidx = lax.top_k(sm, K2)
        return jnp.sort(tidx, axis=1)

    timeit("topk_smax (transpose+top_k 8k)", topk_smax, smax)

    tidx = jax.jit(topk_smax)(smax)
    jax.block_until_ready(tidx)

    # --- step 2: gather K2 sub-tiles of H
    def gather_tiles(H, tidx):
        tiles = H.reshape(Q, n_sub, 128)
        return jnp.take_along_axis(tiles, tidx[:, :, None], axis=1)

    timeit("gather 32x128 H sub-tiles", gather_tiles, H, tidx)

    cand = jax.jit(gather_tiles)(H, tidx)
    flat = cand.reshape(Q, K2 * 128)
    jax.block_until_ready(flat)

    # --- step 3: final top_k over gathered values
    def topk_flat(flat):
        return lax.top_k(flat, K2)

    timeit("topk_flat [512, 4096] k=32", topk_flat, flat)

    # --- whole current heavy_candidates for reference
    from nextsearch_tpu.ops.bm25_sparse import heavy_candidates

    def full(H, smax):
        return heavy_candidates(H, smax, K2, Q, n_slots)

    timeit("heavy_candidates (current)", full, H, smax)

    # --- hierarchical narrowing: 128-doc sub-tiles -> 32-doc blocks.
    # Needs a second maxima level (smax32 [n_slots/32, Q], would come from
    # the fused kernel epilogue for free); here synthesized to measure the
    # gather/topk chain. Every level keeps the provable bound: the true
    # k-th doc's block max >= its score at ANY granularity, all f32 exact.
    CS2 = 32
    n_b32 = n_slots // CS2
    smax32 = jnp.asarray(r.random((Q, n_b32), np.float32))
    jax.block_until_ready(smax32)

    def hier(H, smax, smax32):
        sm = jnp.transpose(smax)[:, :n_sub]
        _v, tidx = lax.top_k(sm, K2)  # [Q, 32] 128-doc sub-tiles
        tidx = jnp.sort(tidx, axis=1)
        # gather the 4 32-doc maxima of each chosen sub-tile
        m32 = smax32.reshape(Q, n_sub, 128 // CS2)
        g32 = jnp.take_along_axis(m32, tidx[:, :, None], axis=1)
        # [Q, 32*4] -> top-32 32-doc blocks (absolute block id)
        blk = tidx[:, :, None] * (128 // CS2) + jnp.arange(
            128 // CS2, dtype=jnp.int32
        )
        _v2, bi = lax.top_k(g32.reshape(Q, K2 * 4), K2)
        bidx = jnp.take_along_axis(blk.reshape(Q, K2 * 4), bi, axis=1)
        bidx = jnp.sort(bidx, axis=1)
        # gather 32 x 32-doc blocks of H
        tiles32 = H.reshape(Q, n_b32, CS2)
        cand = jnp.take_along_axis(tiles32, bidx[:, :, None], axis=1)
        flat = cand.reshape(Q, K2 * CS2)
        vals, pos = lax.top_k(flat, K2)
        base = jnp.take_along_axis(bidx, pos // CS2, axis=1) * CS2
        docs = jnp.where(vals > 0, base + pos % CS2, jnp.int32(2**30))
        return vals, docs.astype(jnp.int32)

    timeit("hier 128->32 narrowing", hier, H, smax, smax32)

    # isolate: the 32-wide H gather alone
    bidx = jax.jit(lambda s: jnp.sort(
        lax.top_k(s.reshape(Q, n_b32)[:, : K2 * 4], K2)[1], axis=1
    ))(smax32)
    jax.block_until_ready(bidx)

    def gather32(H, bidx):
        tiles32 = H.reshape(Q, n_b32, CS2)
        return jnp.take_along_axis(tiles32, bidx[:, :, None], axis=1)

    timeit("gather 32x32 H blocks", gather32, H, bidx)

    # --- alternative: top_k on [Q, n_sub] via iterative fold to 2K2 then
    # exact top_k on the survivors' blocks? First measure raw max-fold cost.
    def fold_max(smax):
        sm = jnp.transpose(smax)[:, :7680]
        return jnp.max(sm.reshape(Q, 60, 128), axis=2)

    timeit("fold max 8192->64 (bandwidth ref)", fold_max, smax)

    # --- matmul TILE sweep -------------------------------------------------
    from nextsearch_tpu.ops import heavy_pallas as hp

    U = 368
    uc = 384
    rows3 = jnp.asarray(
        r.random((uc, n_slots // 128, 128), np.float32)
    ).astype(jnp.bfloat16)
    mix = jnp.asarray(r.random((Q, uc), np.float32))
    table2 = rows3.reshape(uc, n_slots)
    jax.block_until_ready((rows3, mix, table2))

    def fused(mix, table):
        return hp.heavy_fused_pallas(mix, table, fast=True)

    timeit("heavy_fused_pallas TILE=2048", fused, mix, table2)

    # Temporarily widen the grid tile (CSUB/selection granularity is
    # unchanged; smax rows per program scale with TILE//CSUB).
    for tile in (4096, 8192, 16384):
        orig = (hp.TILE, hp._SPT, hp._CPT)
        hp.TILE = tile
        hp._SPT = tile // hp.SUB
        hp._CPT = tile // hp.CSUB
        try:
            def fusedw(mix, table):
                return hp.heavy_fused_pallas(mix, table, fast=True)

            timeit(f"heavy_fused_pallas TILE={tile}", fusedw, mix, table2)
        except Exception as e:  # noqa: BLE001
            print(f"TILE={tile}: FAILED {type(e).__name__}: {e}")
        finally:
            hp.TILE, hp._SPT, hp._CPT = orig


if __name__ == "__main__":
    main()
