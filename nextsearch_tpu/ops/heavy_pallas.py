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
SUB = 512  # docs per entry-application slice (unified kernel windows)
_SPT = TILE // SUB  # entry slices per grid tile
CSUB = 128  # docs per candidate sub-tile (selection maxima granularity;
#             finer than SUB so candidate extraction gathers 4x less H
#             volume for the same provable top-k2 bound)
_CPT = TILE // CSUB  # candidate sub-tiles per grid tile


def _round_up_store(h32, dtype):
    """Cast a NON-NEGATIVE f32 array for storage; bf16 rounds toward +inf.

    Round-up makes every stored selection value an UPPER bound on the f32
    accumulator, so the guarded fast path's exclusion proof ("every doc
    left out of the pool has approx <= tau, hence true <= (1+eps)*tau")
    needs NO epsilon for the storage rounding at all — round-to-nearest
    would cost 2^-9 of guard margin, measured as 12/512 queries tripping
    the guard (whole-batch wide relaunches) at the 1M serving point.
    For positive f32, adding 0xFFFF before truncating the mantissa to 8
    bits implements round-up exactly (mantissa carry rolls into the
    exponent, which is correct); zero stays zero, so positivity — and
    with it `found` — is preserved bit-exactly.
    """
    if dtype == jnp.float32:
        return h32
    bits = lax.bitcast_convert_type(h32, jnp.uint32)
    up = ((bits + jnp.uint32(0xFFFF)) >> jnp.uint32(16)).astype(jnp.uint16)
    return lax.bitcast_convert_type(up, jnp.bfloat16)


def _make_kernel(fast: bool):
    def _kernel(mix_ref, dense_ref, h_ref, smax_ref, cnt_ref):
        import jax.experimental.pallas as pl

        t = pl.program_id(0)

        # The smax/cnt blocks are revisited by every program; rows past the
        # real tile count are never written per-tile, so initialize the
        # whole block once.
        @pl.when(t == 0)
        def _():
            smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

        # precision=HIGHEST is load-bearing for UNGUARDED selection:
        # Mosaic's DEFAULT f32 dot runs a single bf16 pass (measured relerr
        # 5.8e-4 on hardware) and H feeds candidate SELECTION — near-uniform
        # heavy terms (per-doc scores within ~1e-4) then collapse and the K2
        # pool can exclude true top-K docs, the exact failure class of bf16
        # dense rows. HIGHEST (6-pass) measures 1.4e-7, far below any
        # plateau the f32 eager scores can represent. fast=True (1-pass
        # DEFAULT, 6x fewer MXU passes) is ONLY legal under the guarded
        # pipeline (bm25_sparse fast path), whose post-rescore threshold
        # check relaunches the HIGHEST kernel whenever the margin could
        # matter. Positivity is exact either way (all operands positive, no
        # cancellation), so found counts never depend on the precision.
        h32 = jnp.dot(
            mix_ref[:],
            dense_ref[:],
            preferred_element_type=jnp.float32,
            precision=(
                lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
            ),
        )  # [Q, TILE]
        h_ref[:] = _round_up_store(h32, h_ref.dtype)
        q = h32.shape[0]
        sm = jnp.max(h32.reshape(q, _CPT, CSUB), axis=2)  # [Q, _CPT]
        ct = jnp.sum((h32 > 0).astype(jnp.float32), axis=1)  # [Q]
        # smax is laid out [_CPT, tiles, Q] so each program writes a size-1
        # dynamic slice on the sublane dim (Mosaic cannot prove t*_CPT is
        # 8-aligned for a [_CPT]-sized slice of a [n_csub, Q] layout).
        smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(_CPT, 1, q)
        cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)

    return _kernel


_kernel = _make_kernel(fast=False)
_kernel_fast = _make_kernel(fast=True)


def heavy_fused_pallas(
    mix: jax.Array,  # f32 [Q, ND] per-(query, dense row) summed weights
    dense: jax.Array,  # bf16/f32 [ND, n_slots]
    *,
    fast: bool = False,
    interpret: bool = False,
    h_dtype=jnp.float32,
):
    """Returns (H [Q, n_slots] in h_dtype, smax f32 [n_sub_pad, Q],
    counts f32 [n_tiles_pad, Q]). n_slots must be a multiple of TILE.

    H defaults to f32: a bf16 H collapses near-uniform heavy scores into
    false ties, and any K2-wide candidate pool can then exclude true
    top-K docs (measured: 2/64 queries wrong at 25k docs on a df=N term).
    h_dtype=bf16 is ONLY legal under the guarded fast path (bm25_sparse
    fast_heavy), which widens its guard epsilon by the bf16 rounding bound
    (2^-9) and relaunches the exact wide kernel when the margin could
    matter; it halves the kernel's dominant HBM write (the [Q, n_slots]
    H tile) and the downstream H-gather traffic. Positivity is preserved
    exactly either way (bf16 shares f32's exponent range, so a positive
    normal f32 never rounds to zero) — found counts and the light/heavy
    doc classification stay exact. smax stays f32 from the pre-rounding
    accumulator.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, ND = mix.shape
    n_slots = dense.shape[1]
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _CPT

    grid = (n_tiles,)
    out = pl.pallas_call(
        _kernel_fast if fast else _kernel,
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
                (_CPT, tiles_pad, Q),
                lambda t: (0, 0, 0),
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
        interpret=interpret,
    )(mix.astype(dense.dtype), dense)
    h, smax3, cnt = out
    # [(sub-in-tile), tile, Q] -> [tile*_CPT + sub, Q] (doc-major sub order)
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    return h, smax, cnt


def heavy_fused_xla(
    mix: jax.Array, dense: jax.Array, *, fast: bool = False,
    h_dtype=jnp.float32,
):
    """Pure-XLA reference for heavy_fused_pallas (and the CPU path).

    Runs on real TPU in the sharded fallback, where XLA's DEFAULT f32 dot
    is also a single bf16 pass — HIGHEST for the same selection-fidelity
    reason as the Pallas kernel (no-op on CPU, where f32 dots are exact).
    fast=True mirrors the kernel's guarded 1-pass mode; h_dtype mirrors
    its guarded bf16 H storage (smax/counts still from the f32 values).
    """
    Q = mix.shape[0]
    n_slots = dense.shape[1]
    n_tiles = n_slots // TILE
    n_sub = n_slots // CSUB
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _CPT
    h32 = jnp.dot(
        mix.astype(dense.dtype),
        dense,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST,
    )
    smax = jnp.transpose(
        jnp.max(h32.reshape(Q, n_sub, CSUB), axis=2)
    )  # [n_sub, Q]
    cnt = jnp.transpose(
        jnp.sum(
            (h32.reshape(Q, n_tiles, TILE) > 0), axis=2
        ).astype(jnp.float32)
    )
    neg = jnp.float32(-jnp.inf)
    return (
        _round_up_store(h32, h_dtype),
        jnp.pad(smax, ((0, sub_pad - n_sub), (0, 0)), constant_values=neg),
        jnp.pad(cnt, ((0, tiles_pad - n_tiles), (0, 0))),
    )


def tile_stats_xla(totals: jax.Array):
    """Per-sub-tile maxima + per-tile positive counts of a totals matrix
    (XLA; the epilogue of unified_fused_xla / the CPU path)."""
    Q, n_slots = totals.shape
    n_tiles = n_slots // TILE
    n_sub = n_slots // CSUB
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _CPT
    smax = jnp.transpose(jnp.max(totals.reshape(Q, n_sub, CSUB), axis=2))
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


ENT_W = 128  # light entries per packed window (one (8,128) int32 tile)
ENT_G = 4  # windows per DMA group (one 16KB contiguous copy)
_RING = 2  # DMA groups in flight (double buffer)


def _make_unified_kernel(fast: bool):
    def _unified_kernel(
        eoff_ref, mix_ref, dense_ref, ent_ref,
        tot_ref, smax_ref, cnt_ref,
        w_ref, sem,
    ):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

        # Heavy block on the MXU. HIGHEST for unguarded selection fidelity
        # (see _kernel); fast=True (DEFAULT, one bf16 pass) is ONLY legal
        # under the guarded unified pipeline, whose post-rescore threshold
        # proof relaunches the exact wide kernel when the margin could
        # matter. The light-entry application below is exact at EITHER
        # precision (3-way bf16 split), so only the heavy part of a
        # selection value carries the DEFAULT dot's relative error.
        h = jnp.dot(
            mix_ref[:],
            dense_ref[:],
            preferred_element_type=jnp.float32,
            precision=(
                lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
            ),
        )  # [Q, TILE]
        q = h.shape[0]

        iota_q = lax.broadcasted_iota(jnp.int32, (q, ENT_W), 0)
        iota_d = lax.broadcasted_iota(jnp.int32, (TILE, ENT_W), 0)
        base = t * TILE

        # This tile's slice of the doc-sorted entry stream, in aligned
        # ENT_G-window groups. Over-application is SAFE: an entry whose doc
        # falls outside [base, base + TILE) matches no iota_d column, so
        # neighbouring tiles' entries in boundary/overflow groups contribute
        # exactly zero — which lets the group count round up to pairs with no
        # per-window validity logic (stale-buffer reuse would NOT be safe:
        # a prior program's boundary window can hold this tile's docs, so
        # every applied group is freshly DMA'd).
        e0 = eoff_ref[t]
        e1 = eoff_ref[t + 1]
        w_lo = e0 // ENT_W
        nwin = jnp.where(e1 > e0, (e1 + ENT_W - 1) // ENT_W - w_lo, 0)
        ngp = (nwin + 2 * ENT_G - 1) // (2 * ENT_G)  # group PAIRS

        def copy(g, b):
            return pltpu.make_async_copy(
                ent_ref.at[pl.ds(w_lo + g * ENT_G, ENT_G)],
                w_ref.at[b],
                sem.at[b],
            )

        @pl.when(ngp > 0)
        def _():
            copy(0, 0).start()
            copy(1, 1).start()

        def apply(hs, b):
            for j in range(ENT_G):
                wd = w_ref[b, j, 0:1, :]  # [1, ENT_W] doc slots
                wq = w_ref[b, j, 1:2, :]  # [1, ENT_W] query rows
                wv = lax.bitcast_convert_type(
                    w_ref[b, j, 2:3, :], jnp.float32
                )  # [1, ENT_W] contributions (f32 bit patterns)
                dl = wd - base
                # Entries become two one-hot operands and ride the MXU:
                #   m1[q, i] = v_i where q == q_i;  m2[d, i] = 1 where d == d_i
                #   A = m1 @ m2^T -> A[q, d] = sum of v_i landing on (q, d)
                # The value operand is split into three bf16 parts with
                # non-overlapping mantissas (8+8+8 >= f32's 24 bits, each
                # residual exact by Sterbenz), so three DEFAULT single-pass
                # bf16 dots reproduce v_i EXACTLY — same f32-faithful totals
                # as a HIGHEST dot at half the MXU passes. The one-hot operand
                # is exact in bf16 by construction.
                # selects stay in f32 (an i1 mask in the bf16 (16,128) tiling
                # is a Mosaic-illegal relayout, measured); the f32->bf16 casts
                # are exact because every selected value is bf16-representable
                v1 = wv.astype(jnp.bfloat16).astype(jnp.float32)
                r1 = wv - v1
                v2 = r1.astype(jnp.bfloat16).astype(jnp.float32)
                v3 = r1 - v2
                m2 = jnp.where(
                    dl == iota_d, jnp.float32(1.0), jnp.float32(0.0)
                ).astype(jnp.bfloat16)  # [TILE, ENT_W]
                for vk in (v1, v2, v3):
                    m1 = jnp.where(
                        wq == iota_q, vk, jnp.float32(0.0)
                    ).astype(jnp.bfloat16)
                    hs = hs + lax.dot_general(
                        m1, m2,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
            return hs

        def pair(p, hs):
            # consume buffer 0, then immediately refill it for the next pair
            # while buffer 1's in-flight copy finishes behind this compute
            copy(2 * p, 0).wait()
            hs = apply(hs, 0)

            @pl.when(p + 1 < ngp)
            def _():
                copy(2 * p + 2, 0).start()

            copy(2 * p + 1, 1).wait()
            hs = apply(hs, 1)

            @pl.when(p + 1 < ngp)
            def _():
                copy(2 * p + 3, 1).start()

            return hs

        hs = lax.fori_loop(0, ngp, pair, h)

        tot_ref[:] = hs
        sm = jnp.max(hs.reshape(q, _CPT, CSUB), axis=2)  # [Q, _CPT]
        ct = jnp.sum((hs > 0).astype(jnp.float32), axis=1)
        smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(_CPT, 1, q)
        cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)

    return _unified_kernel


_unified_kernel = _make_unified_kernel(fast=False)
_unified_kernel_fast = _make_unified_kernel(fast=True)


def unified_fused_pallas(
    mix: jax.Array,  # f32 [Q, uc] per-(query, compact row) summed weights
    dense: jax.Array,  # f32 [uc, n_slots] compact gathered table
    ent_pack: jax.Array,  # int32 [NW, 8, ENT_W] packed entry windows:
    #   row 0 = doc slot (sorted asc across windows; sentinel n_slots),
    #   row 1 = query row, row 2 = contribution f32 bit pattern, rows 3-7
    #   unused (the (8,128) shape is one int32 memory tile — whole-window
    #   DMAs at a dynamic untiled index are the only Mosaic-legal dynamic
    #   copy; lane- or sublane-sliced streams are rejected, measured).
    #   MUST carry >= 2*ENT_G trailing sentinel windows: group rounding
    #   reads up to 2*ENT_G - 1 windows past a tile's last entry.
    eoff: jax.Array,  # int32 [n_tiles + 1] entry offsets per TILE-doc tile
    *,
    fast: bool = False,
    interpret: bool = False,
):
    """Heavy matmul + light-entry application + selection epilogue, one pass.

    The totals matrix never leaves VMEM unsummed: each 2048-doc tile's
    program computes the heavy MXU block, then streams the aligned
    128-entry windows overlapping its slice of the doc-sorted light entry
    stream — ENT_G windows per contiguous DMA, double-buffered so copies
    hide behind the one-hot matmuls (v3 issued one serial start/wait per
    window: ~2us x thousands of windows of dead time) — and folds them in
    as exact 3-way-bf16-split one-hot matmuls (no scatter — XLA's
    scatter-add of 213k elements into [Q, n_slots] costs ~95 ms on this
    toolchain), and emits per-sub-tile maxima + exact positive counts of
    the SUMMED tile. Replaces the reference's per-posting accumulation
    loop (src/api_engine.cpp:473-496) for the whole query, light and heavy
    terms together.

    Returns (totals f32 [Q, n_slots], smax f32 [n_sub_pad, Q],
    counts f32 [n_tiles_pad, Q]).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, uc = mix.shape
    n_slots = dense.shape[1]
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _CPT

    out = pl.pallas_call(
        _unified_kernel_fast if fast else _unified_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (Q, uc), lambda t, eoff: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (uc, TILE), lambda t, eoff: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (Q, TILE), lambda t, eoff: (0, t), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (_CPT, tiles_pad, Q),
                    lambda t, eoff: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (tiles_pad, Q), lambda t, eoff: (0, 0), memory_space=pltpu.VMEM
                ),
            ],
            scratch_shapes=[
                pltpu.VMEM((_RING, ENT_G, 8, ENT_W), jnp.int32),
                pltpu.SemaphoreType.DMA((_RING,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Q, n_slots), jnp.float32),
            jax.ShapeDtypeStruct((_CPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(eoff, mix, dense, ent_pack)
    tot, smax3, cnt = out
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    return tot, smax, cnt


def unified_fused_xla(mix, dense, ent_pack, eoff, *, fast: bool = False):
    """Pure-XLA reference for unified_fused_pallas (and the CPU path).

    Semantics note: the scatter-add runs fine on CPU; on TPU it is the
    ~95 ms path the Pallas kernel exists to avoid. HIGHEST on the heavy
    dot for the same selection fidelity as the kernel (no-op on CPU);
    fast=True mirrors the kernel's guarded 1-pass DEFAULT mode."""
    Q = mix.shape[0]
    n_slots = dense.shape[1]
    H = jnp.dot(
        mix, dense, preferred_element_type=jnp.float32,
        precision=lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST,
    )
    docs_all = ent_pack[:, 0, :].reshape(-1)
    qs_all = ent_pack[:, 1, :].reshape(-1)
    vs_all = lax.bitcast_convert_type(
        ent_pack[:, 2, :], jnp.float32
    ).reshape(-1)
    n = eoff[-1]
    iota = lax.broadcasted_iota(jnp.int32, docs_all.shape, 0)
    live = iota < n
    docs = jnp.where(live, jnp.clip(docs_all, 0, n_slots - 1), 0)
    qs = jnp.where(live, jnp.clip(qs_all, 0, Q - 1), 0)
    vs = jnp.where(live, vs_all, 0.0)
    totals = H.at[qs, docs].add(vs)
    smax, cnt = tile_stats_xla(totals)
    return totals, smax, cnt


def _rowgather_kernel(ids_ref, dense_ref, out_ref, sems_ref):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    uc = out_ref.shape[0]
    NS = 32  # DMA copies kept in flight (8 measured 211GB/s effective on
    #          the 4MB-row gather at 1M slots — well under HBM; a deeper
    #          ring hides more per-copy issue/complete latency)

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
            scratch_shapes=[pltpu.SemaphoreType.DMA((32,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (uc,) + dense3.shape[1:], dense3.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(ids, dense3)
    return out


_GBF_NS = 4  # converting-gather ring depth (slots x 4MB rows in VMEM)


def _make_gbf_kernel(nprog: int):
    def _kernel(ids_ref, dense_ref, out_ref, *refs):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        x_refs, sems_ref = refs[:-1], refs[-1]
        u = pl.program_id(0)

        def start(slot, uu):
            pltpu.make_async_copy(
                dense_ref.at[ids_ref[uu]], x_refs[slot], sems_ref.at[slot]
            ).start()

        @pl.when(u == 0)
        def _():
            for i in range(min(_GBF_NS, nprog)):
                start(i, i)

        # the refilled slot is always u's own (u + NS ≡ u mod NS)
        for slot in range(_GBF_NS):
            @pl.when(u % _GBF_NS == slot)
            def _(slot=slot):
                pltpu.make_async_copy(
                    dense_ref.at[ids_ref[0]],
                    x_refs[slot],
                    sems_ref.at[slot],
                ).wait()
                out_ref[0] = x_refs[slot][:].astype(jnp.bfloat16)

                @pl.when(u + _GBF_NS < nprog)
                def _():
                    start(slot, u + _GBF_NS)

    return _kernel


def gather_rows_bf16_pallas(ids: jax.Array, dense3: jax.Array):
    """gather_rows_pallas + round-to-nearest bf16 conversion in one pass.

    For the GUARDED fast kernel only: its heavy dot runs at DEFAULT
    precision, which truncates both operands to bf16 (RN) before the
    single MXU pass — so pre-rounding the gathered table is bit-identical
    to feeding it f32 (verified on hardware: H matches the f32-table fast
    kernel exactly), while the compact-table HBM write and the fused
    kernel's table reads halve (measured: the f32 HBM->HBM gather runs at
    ~423 GB/s combined, 7.1 ms/batch — conversion cuts its write half and
    the downstream reads). A _GBF_NS-slot VMEM ring keeps copies in
    flight while converting (a 2-slot version measured SLOWER than the
    pure-DMA f32 gather: one outstanding copy cannot hide the per-row DMA
    latency); the wide HIGHEST relaunch keeps the f32 gather — 6-pass
    needs full-precision operands.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    uc = ids.shape[0]
    r, lanes = dense3.shape[1], dense3.shape[2]
    out = pl.pallas_call(
        _make_gbf_kernel(uc),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(uc,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, r, lanes), lambda u, _i: (u, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((r, lanes), dense3.dtype)
                for _ in range(_GBF_NS)
            ]
            + [pltpu.SemaphoreType.DMA((_GBF_NS,))],
        ),
        out_shape=jax.ShapeDtypeStruct((uc, r, lanes), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(ids, dense3)
    return out


def _make_kernel3(fast: bool):
    def _kernel(mix_ref, dense_ref, h_ref, smax_ref, cnt_ref):
        import jax.experimental.pallas as pl

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            smax_ref[:] = jnp.full_like(smax_ref, -jnp.inf)
            cnt_ref[:] = jnp.zeros_like(cnt_ref)

        q = mix_ref.shape[0]
        ct = jnp.zeros((q,), jnp.float32)
        sms = []
        djs = []
        # one dot per 128-lane sub-block: N=128 is the full MXU width and
        # the contraction (ND) is untouched, so each output element's
        # summation order — and therefore the f32 result — is bit-identical
        # to the 2D kernel's
        for j in range(dense_ref.shape[1]):
            dj = jnp.dot(
                mix_ref[:],
                dense_ref[:, j, :],
                preferred_element_type=jnp.float32,
                precision=(
                    lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
                ),
            )  # [Q, 128]
            djs.append(dj)
            sms.append(jnp.max(dj, axis=1, keepdims=True))  # [Q, 1]
            ct = ct + jnp.sum((dj > 0).astype(jnp.float32), axis=1)
        # ONE whole-block store per grid tile. Per-sub-block stores
        # (h_ref[:, pl.ds(j, 1), :]) slice one sublane of the (16, 128)
        # bf16 tiling — a Mosaic relayout per write that measured the
        # whole h_bf16 serving point at 73 vs 51 ms/batch; a single
        # aligned [Q, TILE/128, 128] store costs nothing extra for f32
        # and makes bf16 H write at full speed.
        h_ref[:] = _round_up_store(
            jnp.stack(djs, axis=1), h_ref.dtype
        )
        sm = jnp.concatenate(sms, axis=1)  # [Q, _CPT] (CSUB == 128)
        smax_ref[:, pl.ds(t, 1), :] = jnp.transpose(sm).reshape(
            _CPT, 1, q
        )
        cnt_ref[pl.ds(t, 1), :] = ct.reshape(1, q)

    return _kernel


_kernel3 = _make_kernel3(fast=False)
_kernel3_fast = _make_kernel3(fast=True)


def heavy_fused3_pallas(
    mix: jax.Array,  # f32 [Q, ND]
    dense3: jax.Array,  # f32/bf16 [ND, n_slots/128, 128] (the STORED layout)
    *,
    fast: bool = False,
    interpret: bool = False,
    h_dtype=jnp.float32,
):
    """heavy_fused_pallas over the 3D STORED table — no 2D relayout, no
    compact gather, no extra HBM buffer.

    The full-table path previously required `dense_rows.reshape(rows,
    n_slots)`, a real multi-GB relayout copy on TPU (tiled physical
    layouts). This kernel block-slices the 3D array directly —
    (ND, TILE/128, 128) blocks, dim 0 untiled — and runs one MXU dot per
    128-lane sub-block. It exists so the exact HIGHEST relaunch kernel is
    compilable at ANY envelope: the compact path's f32 gather table is
    O(U * n_slots) HBM that pushed big envelopes (EVAL config 3: U=960,
    nl=158k) past 16GB and failed compilation. Output H layout is 3D
    [Q, n_slots/128, 128] to match; smax comes per 128-doc sub-block
    (CSUB == 128), bit-identical to the 2D kernel's epilogue.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Q, ND = mix.shape
    nblk = dense3.shape[1]
    n_slots = nblk * 128
    assert n_slots % TILE == 0, (n_slots, TILE)
    n_tiles = n_slots // TILE
    tiles_pad = ((n_tiles + 7) // 8) * 8
    sub_pad = tiles_pad * _CPT

    out = pl.pallas_call(
        _kernel3_fast if fast else _kernel3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Q, ND), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ND, TILE // 128, 128),
                lambda t: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (Q, TILE // 128, 128),
                lambda t: (0, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_CPT, tiles_pad, Q),
                lambda t: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tiles_pad, Q), lambda t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Q, nblk, 128), h_dtype),
            jax.ShapeDtypeStruct((_CPT, tiles_pad, Q), jnp.float32),
            jax.ShapeDtypeStruct((tiles_pad, Q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(mix.astype(dense3.dtype), dense3)
    h3, smax3, cnt = out
    smax = jnp.transpose(smax3, (1, 0, 2)).reshape(sub_pad, Q)
    # H stays in the kernel's native 3D layout [Q, n_slots/128, 128]:
    # reshaping to [Q, n_slots] is a real 2GB relayout copy on TPU (tiled
    # physical layouts regroup sublanes), measured via the standalone
    # reshape+take_along_axis probe (9.2 ms vs 5.1 ms on a resident 3D
    # array). Downstream consumers index 3D (d >> 7, d & 127).
    return h3, smax, cnt


def heavy_fused3_xla(mix, dense3, *, fast: bool = False,
                     h_dtype=jnp.float32):
    """Pure-XLA reference for heavy_fused3_pallas (CPU path)."""
    dense2 = dense3.reshape(dense3.shape[0], -1)
    h, smax, cnt = heavy_fused_xla(mix, dense2, fast=fast, h_dtype=h_dtype)
    nblk = dense2.shape[1] // 128
    return h.reshape(h.shape[0], nblk, 128), smax, cnt
