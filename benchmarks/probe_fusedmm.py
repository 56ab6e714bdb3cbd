"""Micro-probe: where does heavy_fused_pallas spend its ~11.6 ms?

Roofline at the 1M serving point (Q=512, uc=384, bf16 table, f32 H):
table read 0.77GB + H write 2.0GB at ~819GB/s = ~3.4 ms, MXU ~1 ms —
yet the kernel measures ~11.6 ms. This probe times stripped variants to
attribute the gap: epilogue (smax/cnt + transposed stores), H store
dtype, Q blocking, and a pure-XLA dot reference.

Run on the real TPU: python benchmarks/probe_fusedmm.py
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

from nextsearch_tpu.ops.heavy_pallas import (  # noqa: E402
    CSUB,
    TILE,
    _CPT,
    heavy_fused_pallas,
)


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
    print(f"{name:40s} {ms:8.2f} ms")
    return ms


def fused_variant(
    mix, dense, *, epilogue=True, store_h=True, smax_store=True,
    h_dtype=jnp.float32,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, ND = mix.shape
    n_slots = dense.shape[1]
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8

    def kern(mix_ref, dense_ref, h_ref, smax_ref, cnt_ref):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

        h32 = jnp.dot(
            mix_ref[:], dense_ref[:],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.DEFAULT,
        )
        q = h32.shape[0]
        if store_h:
            h_ref[:] = h32.astype(h_ref.dtype)
        else:
            # keep the dot live through smax so Mosaic can't DCE it
            h_ref[:] = jnp.zeros_like(h_ref)
        if epilogue:
            sm = jnp.max(h32.reshape(q, _CPT, CSUB), axis=2)
            ct = jnp.sum((h32 > 0).astype(jnp.float32), axis=1)
            if smax_store:
                smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(
                    _CPT, 1, q
                )
                cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)
            else:
                # reduce to one lane so the VPU work happens but the
                # transposed store does not
                smax_ref[:, pl.ds(t, 1), :] = jnp.broadcast_to(
                    (jnp.max(sm) + jnp.min(ct)).reshape(1, 1, 1),
                    (_CPT, 1, q),
                )

    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Q, ND), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ND, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Q, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (_CPT, tiles_pad, Q), lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tiles_pad, Q), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, n_slots), h_dtype),
            jax.ShapeDtypeStruct((_CPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(mix.astype(dense.dtype), dense)
    return out


def main():
    Q = 512
    uc = 384
    n_slots = 999424
    r = np.random.default_rng(0)
    dense = jnp.asarray(r.random((uc, n_slots), np.float32)).astype(
        jnp.bfloat16
    )
    mix = jnp.asarray(r.random((Q, uc), np.float32))
    jax.block_until_ready((dense, mix))
    print(f"[probe] Q={Q} uc={uc} n_slots={n_slots}")

    timeit("null launch (floor)", lambda x: x[:8, :8] + 1.0, mix)

    timeit(
        "current heavy_fused_pallas fast",
        lambda m, d: heavy_fused_pallas(m, d, fast=True),
        mix, dense,
    )
    timeit(
        "variant full (parity check)",
        functools.partial(fused_variant),
        mix, dense,
    )
    timeit(
        "no epilogue (dot + H store)",
        functools.partial(fused_variant, epilogue=False),
        mix, dense,
    )
    timeit(
        "epilogue, no smax store",
        functools.partial(fused_variant, smax_store=False),
        mix, dense,
    )
    timeit(
        "no H store (dot + epilogue)",
        functools.partial(fused_variant, store_h=False),
        mix, dense,
    )
    timeit(
        "bf16 H store",
        functools.partial(fused_variant, h_dtype=jnp.bfloat16),
        mix, dense,
    )

    # pure-XLA dot reference: how fast does XLA alone do mix @ dense?
    def xla_dot(m, d):
        return jnp.dot(
            m.astype(jnp.bfloat16), d,
            preferred_element_type=jnp.float32,
        )

    timeit("XLA bare dot -> f32 H", xla_dot, mix, dense)

    def xla_dot_bf16(m, d):
        return jnp.dot(
            m.astype(jnp.bfloat16), d,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    timeit("XLA bare dot -> bf16 H", xla_dot_bf16, mix, dense)


if __name__ == "__main__":
    main()
