"""Bisect the bf16-up-H + quantized-sort2 slowdown: time each piece alone.

Run on the real TPU: python benchmarks/probe_bf16h.py
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

from nextsearch_tpu.ops.heavy_pallas import heavy_fused_pallas  # noqa: E402
from nextsearch_tpu.ops.bm25_sparse import per_query_topk_flat  # noqa: E402


def timeit(tag, fn, *args, iters=8):
    r = jax.device_get(fn(*args))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jax.device_get(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:36s} {ms:8.2f} ms")
    return r


def main():
    r = np.random.default_rng(0)
    Q, U, S = 512, 384, 1_001_472
    mix = jnp.asarray(r.random((Q, U), np.float32))
    table = jnp.asarray(r.random((U, S), np.float32))

    f_f32 = jax.jit(lambda m, t: heavy_fused_pallas(m, t, fast=True)[0].sum())
    f_bf = jax.jit(
        lambda m, t: heavy_fused_pallas(
            m, t, fast=True, h_dtype=jnp.bfloat16
        )[0].astype(jnp.float32).sum()
    )
    timeit("fused fast H=f32", f_f32, mix, table)
    timeit("fused fast H=bf16-up", f_bf, mix, table)

    N = 212992
    sq = jnp.asarray(np.sort(r.integers(0, Q + 1, N)).astype(np.int32))
    sc = jnp.asarray((r.random(N) * (r.random(N) > 0.3)).astype(np.float32))
    sd = jnp.asarray(r.integers(0, S, N).astype(np.int32))

    s_exact = jax.jit(
        lambda a, b, c: per_query_topk_flat(
            a, b, c, Q, 32, jnp.int32(2**30), quantized=False
        )[0].sum()
    )
    s_quant = jax.jit(
        lambda a, b, c: per_query_topk_flat(
            a, b, c, Q, 32, jnp.int32(2**30), quantized=True
        )[0].sum()
    )
    timeit("sort2 exact (3-operand)", s_exact, sq, sc, sd)
    timeit("sort2 quantized (packed key)", s_quant, sq, sc, sd)

    from nextsearch_tpu.ops.select_pallas import per_query_topk_pallas

    bounds = jnp.searchsorted(sq, jnp.arange(Q + 1, dtype=jnp.int32)).astype(
        jnp.int32
    )
    sel = jax.jit(
        lambda s, b: per_query_topk_pallas(s, b, Q=Q, k2=32, w_max=4096)[
            0
        ].sum()
    )
    timeit("select_pallas kernel", sel, sc, bounds)


if __name__ == "__main__":
    main()
