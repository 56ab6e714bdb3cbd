"""Bisect the EVAL config-3 wide-kernel compile failure.

AOT-compiles bm25_search_sparse_packed at config 3's exact static shapes
(T=16, Q=512, C=18560, U=960, block=64, wide 2*K2 pools, HIGHEST) with
stages knocked out one at a time via prof_skip, using abstract
ShapeDtypeStructs — no device buffers, just the remote compiler.

Run: python benchmarks/probe_c3_compile.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nextsearch_tpu.utils.compilecache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nextsearch_tpu.ops.bm25_sparse import bm25_search_sparse_packed  # noqa: E402

VARIANTS = {
    "wide_full": (),
    "wide_no_light": ("light", "hgather", "sort2"),
    "wide_no_sort2": ("sort2",),
    "wide_no_heavy": ("heavy_mm", "rowgather", "cand_heavy"),
    "wide_no_rescore": ("rescore",),
    "fast_full": (),
}


def main():
    # config 3 full-scale statics (captured from the crashing call)
    n_slots = 1_001_472
    P = 45_112_142
    nd, nl = 1876, 158_124
    U, T, Q, C, block = 960, 16, 512, 18_560, 64
    K, K2 = 10, 32
    bs_steps = 5
    nd1 = ((nd + 1 + 7) // 8) * 8
    NBl = (n_slots >> 9) + 1

    f32 = jnp.float32
    i32 = jnp.int32
    sd = jax.ShapeDtypeStruct
    args = (
        sd((P,), i32),  # post_doc
        sd((P,), f32),  # post_score
        sd((nd1, n_slots // 128, 128), f32),  # dense_rows
        sd((1, 1), i32),  # bucket_pos (unused when heavy_direct)
        sd((nl + 1, NBl + 1), i32),  # light_bucket_pos
        sd((7, Q, T), i32),  # plan
    )
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        skip = VARIANTS[name]
        fast = name.startswith("fast")
        t0 = time.time()
        try:
            lowered = bm25_search_sparse_packed.lower(
                *args,
                n_slots=n_slots, K=K, K2=K2, C=C, block=block,
                bs_steps=bs_steps, nd=nd, nl=nl, U=U,
                use_pallas=True, use_compact=True, heavy_direct=True,
                fast_heavy=fast, prof_skip=skip,
            )
            lowered.compile()
            print(f"{name:18s} OK   ({time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"{name:18s} FAIL ({time.time()-t0:.0f}s): {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
