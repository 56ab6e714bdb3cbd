"""Does a slice-gather (16 contiguous elements per index) cost like one
random access or like 16? Decides the rescore redesign: the bucket binary
search does 6 dependent single-element gather rounds per (cand, term);
fetching each candidate's whole 16-element bucket in ONE slice-gather and
comparing in-register would replace them if slices are access-priced.

Run on the real TPU: python benchmarks/probe_slicegather.py
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


def timeit(tag, fn, *args, iters=10):
    jax.device_get(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.device_get(fn(*args))
    ms = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:44s} {ms:8.2f} ms")


def main():
    r = np.random.default_rng(0)
    P = 46_770_456
    n = 512 * 4 * 32  # [Q, T, kc] flattened
    arr = jnp.asarray(r.random(P, np.float32))
    idx = jnp.asarray(r.integers(0, P - 16, n).astype(np.int32))

    @jax.jit
    def elem6(a, i):
        # 6 dependent single-element gather rounds (the bs cost model)
        acc = jnp.zeros(n, jnp.float32)
        ii = i
        for _ in range(6):
            v = a[jnp.clip(ii, 0, P - 1)]
            acc = acc + v
            ii = ii + (v > 0.5).astype(jnp.int32)  # dependent next index
        return acc.sum()

    @jax.jit
    def slice16(a, i):
        g = lax.gather(
            a,
            i[:, None],
            lax.GatherDimensionNumbers(
                offset_dims=(1,),
                collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(16,),
            mode=lax.GatherScatterMode.CLIP,
        )  # [n, 16]
        return g.sum()

    @jax.jit
    def elem16(a, i):
        # control: 16 elementwise gathers (what naive indexing lowers to)
        g = a[jnp.clip(i[:, None] + jnp.arange(16, dtype=jnp.int32), 0, P - 1)]
        return g.sum()

    timeit("6 dependent element-gather rounds", elem6, arr, idx)
    timeit("1 slice-gather [n, 16]", slice16, arr, idx)
    timeit("16 elementwise gathers (control)", elem16, arr, idx)


if __name__ == "__main__":
    main()
