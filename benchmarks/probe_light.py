"""Micro-probe: the light chain's component costs and replacements.

profile_serving at the 1M serving point attributes +22.4 ms of the
33.5 ms device budget to the light chain: sort2 +10.7 (which DCEs the
segmented cumsum with it), hgather +7.1, lsort +0.4, expand+rest ~4.2.
The +0.4 lsort marginal vs +10.7 sort2 is the tell: both sort the same
~200k-element volume, but lsort is a packed single-key sort while sort2
is a 2-key sort AND skipping it dead-codes the associative_scan segsum.
This probe times each candidate standalone at serving shapes so the
replacement design is measured, not guessed:

  sort paths      1-key+value, 2-key, 1-key stable, 3-operand
  segsum paths    associative_scan (current), cumsum+cummax difference
                  (native ops, approximate group totals), cumsum+gather
  hgather paths   full 196k-lane element gather (current), last-only
                  gather at the same lane count (masked), compacted
                  gather into a smaller static buffer

Run on the real TPU: python benchmarks/probe_light.py
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

from nextsearch_tpu.ops.bm25_sparse import _segmented_cumsum  # noqa: E402


def timeit(name, fn, *args, n=12):
    c = jax.jit(fn)
    out = c(*args)
    jax.block_until_ready(out)
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
    print(f"{name:44s} {ms:8.2f} ms")
    return ms


def main():
    Q = 512
    C = 3072
    block = 64
    N = C * block  # 196,608 flat entries
    n_slots = 1_000_064
    r = np.random.default_rng(0)

    # Synthetic (q, doc)-sorted light entries with ~1.6 entries/group
    qs = np.sort(r.integers(0, Q, N).astype(np.int32))
    ds = np.zeros(N, np.int32)
    for q in range(Q):  # docs sorted within each query, with dup runs
        m = (qs == q).sum()
        ds[qs == q] = np.sort(r.integers(0, n_slots, m)).astype(np.int32)
    sc = r.random(N, np.float32).astype(np.float32) * 8.0
    sq = jnp.asarray(qs)
    sd = jnp.asarray(ds)
    svals = jnp.asarray(sc)
    first_np = np.concatenate(
        [[True], (qs[1:] != qs[:-1]) | (ds[1:] != ds[:-1])]
    )
    first = jnp.asarray(first_np)
    last = jnp.asarray(np.concatenate([first_np[1:], [True]]))
    H = jnp.asarray(r.random((Q, n_slots), np.float32))
    jax.block_until_ready((sq, sd, svals, first, last, H))
    n_groups = int(first_np.sum())
    print(f"[probe] Q={Q} N={N} groups={n_groups} ({N/n_groups:.2f}/group)")

    timeit("null launch (floor)", lambda x: x[:8] + 1.0, svals)

    # --- segsum paths -----------------------------------------------------
    timeit("segsum assoc_scan (current)", _segmented_cumsum, svals, first)

    def segsum_cumsum_diff(sv, first):
        cs = jnp.cumsum(sv)
        iota = lax.broadcasted_iota(jnp.int32, sv.shape, 0)
        csz = jnp.concatenate([jnp.zeros((1,), jnp.float32), cs])[:-1]
        # cs is monotone (contribs >= 0) so forward-propagating the
        # exclusive prefix at each group start is a plain cummax.
        base = lax.cummax(jnp.where(first, csz, jnp.float32(-1.0)))
        return cs - base

    timeit("segsum cumsum+cummax (approx)", segsum_cumsum_diff, svals, first)

    def segsum_cumsum_gather(sv, first):
        cs = jnp.cumsum(sv)
        iota = lax.broadcasted_iota(jnp.int32, sv.shape, 0)
        gstart = lax.cummax(jnp.where(first, iota, jnp.int32(0)))
        csz = jnp.concatenate([jnp.zeros((1,), jnp.float32), cs])
        return cs - csz[gstart]

    timeit("segsum cumsum+gather (approx)", segsum_cumsum_gather, svals, first)

    # --- selection sort paths --------------------------------------------
    key1 = (sq.astype(jnp.uint32) << jnp.uint32(22)) | (
        lax.bitcast_convert_type(svals, jnp.uint32) >> jnp.uint32(10)
    )
    pay = sd
    jax.block_until_ready((key1, pay))

    timeit(
        "sort 1key+1val (lsort shape)",
        lambda k, v: lax.sort((k, v), num_keys=1),
        key1,
        svals,
    )
    timeit(
        "sort 2key (current sort2)",
        lambda k, p: lax.sort((k, p), num_keys=2),
        key1,
        pay,
    )
    timeit(
        "sort 1key+1val stable",
        lambda k, p: lax.sort((k, p), num_keys=1, is_stable=True),
        key1,
        pay,
    )
    timeit(
        "sort 3op 2key (wide sort2)",
        lambda a, b, c: lax.sort((a, b, c), num_keys=2),
        sq,
        svals,
        pay,
    )
    timeit(
        "sort 1key only",
        lambda k: lax.sort((k,), num_keys=1),
        key1,
    )

    # --- hgather paths ----------------------------------------------------
    def hgather_full(H, sq, sd):
        return H[jnp.clip(sq, 0, Q - 1), jnp.clip(sd, 0, n_slots - 1)]

    timeit("hgather full N lanes (current)", hgather_full, H, sq, sd)

    def hgather_lastmask(H, sq, sd, last):
        qq = jnp.where(last, jnp.clip(sq, 0, Q - 1), 0)
        dd = jnp.where(last, jnp.clip(sd, 0, n_slots - 1), 0)
        return H[qq, dd]

    timeit("hgather masked-to-0 (same lanes)", hgather_lastmask, H, sq, sd, last)

    # compact to L3 static lanes (groups bucket)
    L3 = ((n_groups + 4095) // 4096) * 4096

    def hgather_compact(H, sq, sd, last):
        lidx = jnp.cumsum(last.astype(jnp.int32)) - 1
        lidx = jnp.where(last, jnp.minimum(lidx, L3), L3)
        gq = jnp.zeros((L3 + 1,), jnp.int32).at[lidx].set(sq, mode="drop")
        gd = jnp.zeros((L3 + 1,), jnp.int32).at[lidx].set(sd, mode="drop")
        hv = H[jnp.clip(gq, 0, Q - 1), jnp.clip(gd, 0, n_slots - 1)]
        return hv[lidx]

    timeit(f"hgather compact L3={L3}", hgather_compact, H, sq, sd, last)

    # gather count scaling reference: half the lanes
    sqh, sdh = sq[: N // 2], sd[: N // 2]
    timeit(
        "hgather half lanes (count ref)",
        lambda H, a, b: H[jnp.clip(a, 0, Q - 1), jnp.clip(b, 0, n_slots - 1)],
        H,
        sqh,
        sdh,
    )

    # --- the whole current chain for reference -----------------------------
    def chain_current(sv, first, key1, pay):
        stot = _segmented_cumsum(sv, first)
        k2, p2 = lax.sort((key1, pay), num_keys=2)
        return stot, k2, p2

    timeit("segsum+2keysort (current pair)", chain_current, svals, first, key1, pay)


if __name__ == "__main__":
    main()
