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


def tile_stats_xla(totals: jax.Array):
    """Per-sub-tile maxima + per-tile positive counts of a totals matrix
    (XLA; the epilogue of unified_fused_xla / the CPU path)."""
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


ENT_W = 512  # light entries applied per in-kernel window


def _unified_kernel(
    toff_ref, mix_ref, dense_ref, ed_ref, eq_ref, ev_ref,
    tot_ref, smax_ref, cnt_ref,
    wd_ref, wq_ref, wv_ref, sems,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    h = jnp.dot(
        mix_ref[:], dense_ref[:], preferred_element_type=jnp.float32
    )  # [Q, TILE]
    q = h.shape[0]

    lo = toff_ref[t]
    hi = toff_ref[t + 1]
    nw = (hi - lo + ENT_W - 1) // ENT_W
    iota_q = lax.broadcasted_iota(jnp.int32, (ENT_W, q), 1)
    iota_d = lax.broadcasted_iota(jnp.int32, (ENT_W, TILE), 1)
    iota_w = lax.broadcasted_iota(jnp.int32, (ENT_W, 1), 0)

    def win(w, h):
        start = lo + w * ENT_W
        cps = [
            pltpu.make_async_copy(
                ed_ref.at[pl.ds(start, ENT_W), :], wd_ref, sems.at[0]
            ),
            pltpu.make_async_copy(
                eq_ref.at[pl.ds(start, ENT_W), :], wq_ref, sems.at[1]
            ),
            pltpu.make_async_copy(
                ev_ref.at[pl.ds(start, ENT_W), :], wv_ref, sems.at[2]
            ),
        ]
        for c in cps:
            c.start()
        for c in cps:
            c.wait()
        valid = (iota_w + start) < hi  # [W, 1]
        dl = wd_ref[:] - t * TILE  # [W, 1] local doc in tile
        # Entries become two one-hot operands and ride the MXU:
        #   m1[i, q] = v_i where q == q_i;  m2[i, d] = 1 where d == d_i
        #   A = m1^T @ m2  ->  A[q, d] = sum of v_i landing on (q, d)
        m1 = jnp.where(
            (wq_ref[:] == iota_q) & valid, wv_ref[:], jnp.float32(0.0)
        )
        m2 = jnp.where(dl == iota_d, jnp.float32(1.0), jnp.float32(0.0))
        return h + lax.dot_general(
            m1, m2,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    h = lax.fori_loop(0, nw, win, h)
    tot_ref[:] = h
    sm = jnp.max(h.reshape(q, _SPT, SUB), axis=2)
    ct = jnp.sum((h > 0).astype(jnp.float32), axis=1)
    smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(_SPT, 1, q)
    cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)


def unified_fused_pallas(
    mix: jax.Array,  # f32 [Q, uc] per-(query, compact row) summed weights
    dense: jax.Array,  # f32 [uc, n_slots] compact gathered table
    ent_doc: jax.Array,  # int32 [Np, 1] light-entry doc slots, SORTED asc
    ent_q: jax.Array,  # int32 [Np, 1] light-entry query rows
    ent_v: jax.Array,  # f32 [Np, 1] light-entry contributions
    toff: jax.Array,  # int32 [n_tiles + 1] entry offsets per doc tile
    *,
    interpret: bool = False,
):
    """Heavy matmul + light-entry application + selection epilogue, one pass.

    The totals matrix never leaves VMEM unsummed: each 2048-doc tile's
    program computes the heavy MXU block, DMAs its slice of the doc-sorted
    light entry stream (toff windows of ENT_W), folds the entries in as a
    one-hot matmul (vector-unit friendly; no scatter — XLA's scatter-add
    of 213k elements into [Q, n_slots] costs ~95 ms on this toolchain,
    ~45x this kernel's application cost), and emits per-sub-tile maxima +
    exact positive counts of the SUMMED tile. Replaces the reference's
    per-posting accumulation loop (src/api_engine.cpp:473-496) for the
    whole query, light and heavy terms together.

    Returns (totals f32 [Q, n_slots], smax f32 [n_sub_pad, Q],
    counts f32 [n_tiles_pad, Q]). Entries must be padded so that any
    window start below toff[-1] can read ENT_W rows in bounds.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, uc = mix.shape
    n_slots = dense.shape[1]
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _SPT

    out = pl.pallas_call(
        _unified_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (Q, uc), lambda t, toff: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (uc, TILE), lambda t, toff: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Q, TILE), lambda t, toff: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (_SPT, tiles_pad, Q),
                    lambda t, toff: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tiles_pad, Q), lambda t, toff: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((ENT_W, 1), jnp.int32),
                pltpu.VMEM((ENT_W, 1), jnp.int32),
                pltpu.VMEM((ENT_W, 1), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Q, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((_SPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(toff, mix, dense, ent_doc, ent_q, ent_v)
    tot, smax3, cnt = out
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    return tot, smax, cnt


def unified_fused_xla(mix, dense, ent_doc, ent_q, ent_v, toff):
    """Pure-XLA reference for unified_fused_pallas (and the CPU path).

    Semantics note: the scatter-add runs fine on CPU; on TPU it is the
    ~95 ms path the Pallas kernel exists to avoid."""
    Q = mix.shape[0]
    n_slots = dense.shape[1]
    H = jnp.dot(mix, dense, preferred_element_type=jnp.float32)
    n = toff[-1]
    iota = lax.broadcasted_iota(jnp.int32, ent_doc.shape, 0)
    live = iota < n
    docs = jnp.where(live, jnp.clip(ent_doc, 0, n_slots - 1), 0)[:, 0]
    qs = jnp.where(live, jnp.clip(ent_q, 0, Q - 1), 0)[:, 0]
    vs = jnp.where(live, ent_v, 0.0)[:, 0]
    totals = H.at[qs, docs].add(vs)
    smax, cnt = tile_stats_xla(totals)
    return totals, smax, cnt


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
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
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
