"""Fused heavy-term scoring: matmul + per-sub-tile max + hit counts, one pass.

The hybrid posting representation stores high-df ("heavy") terms as dense
per-doc score rows so their query-time contribution is one MXU matmul
(replacing the reference's per-posting disk loop for exactly the terms where
it is most expensive — src/api_engine.cpp:469-481). Profiling at 1M docs
showed the matmul itself is cheap but XLA then re-reads the [Q, n_slots]
output twice (per-tile max for candidate selection ~37ms, matched-doc count
~5-80ms depending on fusion). This Pallas kernel computes all three in a
single pass over each output tile while it is still resident in VMEM:

    H[q, d]     = sum_r mix[q, r] * dense[r, d]      (MXU, f32 accumulate)
    smax[s, q]  = max_d-in-subtile H[q, d]           (VPU epilogue)
    counts[t, q]= #{d in tile : H[q, d] > 0}         (VPU epilogue)

Grid is one program per 2048-doc tile; mix stays resident, each program
DMAs its dense tile, and the epilogue costs nothing extra in HBM traffic.
Maxima are recorded per SUB=512-doc sub-tile (4 per grid tile): candidate
extraction then gathers 4x less H volume for the same provable top-k2
bound (a doc's own sub-tile max >= its score).

On CPU (tests) the kernel runs in Pallas interpreter mode; `heavy_fused_xla`
is the reference implementation both are checked against.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

TILE = 2048  # docs per kernel grid tile (MXU-efficient output block)
SUB = 512  # docs per candidate sub-tile (maxima granularity)
_SPT = TILE // SUB  # sub-tiles per grid tile


def _kernel(mix_ref, dense_ref, h_ref, smax_ref, cnt_ref):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)

    # The smax/cnt blocks are revisited by every program; rows past the
    # real tile count are never written per-tile, so initialize the whole
    # block once.
    @pl.when(t == 0)
    def _():
        smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    h32 = jnp.dot(
        mix_ref[:], dense_ref[:], preferred_element_type=jnp.float32
    )  # [Q, TILE]
    h_ref[:] = h32.astype(h_ref.dtype)
    q = h32.shape[0]
    sm = jnp.max(h32.reshape(q, _SPT, SUB), axis=2)  # [Q, _SPT]
    ct = jnp.sum((h32 > 0).astype(jnp.float32), axis=1)  # [Q]
    # smax is laid out [_SPT, tiles, Q] so each program writes a size-1
    # dynamic slice on the sublane dim (Mosaic cannot prove t*_SPT is
    # 8-aligned for a [_SPT]-sized slice of a [n_sub, Q] layout).
    smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(_SPT, 1, q)
    cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)


def heavy_fused_pallas(
    mix: jax.Array,  # f32 [Q, ND] per-(query, dense row) summed weights
    dense: jax.Array,  # bf16/f32 [ND, n_slots]
    *,
    interpret: bool = False,
):
    """Returns (H f32 [Q, n_slots], smax f32 [n_sub_pad, Q],
    counts f32 [n_tiles_pad, Q]). n_slots must be a multiple of TILE.

    H is kept in f32: a bf16 H collapses near-uniform heavy scores into
    false ties, and any K2-wide candidate pool can then exclude true
    top-K docs (measured: 2/64 queries wrong at 25k docs on a df=N term).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, ND = mix.shape
    n_slots = dense.shape[1]
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _SPT

    grid = (n_tiles,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Q, ND), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ND, TILE), lambda t: (0, t), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((Q, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
            # whole-array blocks revisited by every program; each writes its
            # own rows
            pl.BlockSpec(
                (_SPT, tiles_pad, Q),
                lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tiles_pad, Q), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((_SPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mix.astype(dense.dtype), dense)
    h, smax3, cnt = out
    # [(sub-in-tile), tile, Q] -> [tile*_SPT + sub, Q] (doc-major sub order)
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    return h, smax, cnt


def heavy_fused_xla(mix: jax.Array, dense: jax.Array):
    """Pure-XLA reference for heavy_fused_pallas (and the CPU path)."""
    Q = mix.shape[0]
    n_slots = dense.shape[1]
    n_tiles = n_slots // TILE
    n_sub = n_slots // SUB
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _SPT
    h32 = jnp.dot(
        mix.astype(dense.dtype), dense, preferred_element_type=jnp.float32
    )
    smax = jnp.transpose(
        jnp.max(h32.reshape(Q, n_sub, SUB), axis=2)
    )  # [n_sub, Q]
    cnt = jnp.transpose(
        jnp.sum(
            (h32.reshape(Q, n_tiles, TILE) > 0), axis=2
        ).astype(jnp.float32)
    )
    neg = jnp.float32(-jnp.inf)
    return (
        h32,
        jnp.pad(smax, ((0, sub_pad - n_sub), (0, 0)), constant_values=neg),
        jnp.pad(cnt, ((0, tiles_pad - n_tiles), (0, 0))),
    )


def _tilestats_kernel(t_ref, smax_ref, cnt_ref):
    import jax.experimental.pallas as pl

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    tile = t_ref[:]  # [Q, TILE] f32
    q = tile.shape[0]
    sm = jnp.max(tile.reshape(q, _SPT, SUB), axis=2)
    ct = jnp.sum((tile > 0).astype(jnp.float32), axis=1)
    smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(_SPT, 1, q)
    cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)


def tile_stats_pallas(totals: jax.Array, *, interpret: bool = False):
    """Per-sub-tile maxima + per-tile positive counts of a [Q, n_slots]
    totals matrix, one VMEM pass (the heavy kernel's epilogue without the
    matmul). Returns (smax f32 [n_sub_pad, Q], counts f32 [n_tiles_pad, Q]).

    The unified sparse pipeline (ops/bm25_sparse.bm25_search_sparse_unified)
    scatter-adds light contributions INTO H and then reads selection maxima
    and the exact matched-doc count off the summed matrix in this single
    pass — replacing the light path's two global sorts, segmented scans,
    and H-gather (reference accumulation loop being replaced:
    /root/reference/src/api_engine.cpp:473-496)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, n_slots = totals.shape
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _SPT

    out = pl.pallas_call(
        _tilestats_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Q, TILE), lambda t: (0, t), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (_SPT, tiles_pad, Q),
                lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tiles_pad, Q), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_SPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(totals)
    smax3, cnt = out
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    return smax, cnt


def tile_stats_xla(totals: jax.Array):
    """Pure-XLA reference for tile_stats_pallas (and the CPU path)."""
    Q, n_slots = totals.shape
    n_tiles = n_slots // TILE
    n_sub = n_slots // SUB
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _SPT
    smax = jnp.transpose(jnp.max(totals.reshape(Q, n_sub, SUB), axis=2))
    cnt = jnp.transpose(
        jnp.sum(
            (totals.reshape(Q, n_tiles, TILE) > 0), axis=2
        ).astype(jnp.float32)
    )
    neg = jnp.float32(-jnp.inf)
    return (
        jnp.pad(smax, ((0, sub_pad - n_sub), (0, 0)), constant_values=neg),
        jnp.pad(cnt, ((0, tiles_pad - n_tiles), (0, 0))),
    )


def _rowgather_kernel(ids_ref, dense_ref, out_ref, sems_ref):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    uc = out_ref.shape[0]
    NS = 8  # DMA copies kept in flight

    def copy(u):
        return pltpu.make_async_copy(
            dense_ref.at[ids_ref[u]], out_ref.at[u], sems_ref.at[u % NS]
        )

    for i in range(min(NS, uc)):
        copy(i).start()

    def body(u, _):
        @pl.when(u + NS < uc)
        def _():
            copy(u + NS).start()

        copy(u).wait()
        return 0

    lax.fori_loop(0, uc, body, 0)


def gather_rows_pallas(ids: jax.Array, dense3: jax.Array):
    """Gather dense3[ids] ([ND, n_slots/128, 128]) as whole-row DMAs.

    XLA lowers this row gather ~10x off roofline (measured: it turned a
    6x-FLOP-reduction compact matmul into a net loss); one DMA per row
    runs at copy bandwidth. The table must be STORED in the 3D layout —
    Mosaic requires DMA slices aligned to the (8/16, 128) tiling, and
    dimension 0 of a 3D ref is untiled so whole-row slices are legal; a
    per-launch reshape of the 2D table is a real 6GB relayout copy on
    TPU (tiled physical layouts), measured as a net loss. A ring of NS
    in-flight copies hides per-DMA latency; one grid program issues all.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    uc = ids.shape[0]
    out = pl.pallas_call(
        _rowgather_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (uc,) + dense3.shape[1:], dense3.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(ids, dense3)
    return out
