"""Per-query exact top-k2 selection over the (q, doc)-sorted flat array.

Replaces the light-candidate selection sort (`per_query_topk_flat`): that
path re-sorts all C*block flat entries by (q, score desc, doc asc) — a
3-operand 213k-element XLA sort measured at 6.5 ms/batch at the 1M serving
point — to extract only the top-K2 (=32) entries per query. This kernel
exploits what the sort ignores: the flat array is ALREADY query-contiguous
(and doc-sorted within each query) after the light-totals sort, so per-query
top-k is a windowed max-reduction, not a global reorder.

Layout per grid program (QB=32 queries, DMA double-buffered across
programs):
  - ONE row-aligned DMA per query: the 3D view [N/1024, 8, 128] makes dim 0
    untiled, so a dynamic block slice starting at the query's 1024-aligned
    floor is tiling-legal (the same trick as
    heavy_pallas.gather_rows_pallas; a lane-granular dynamic window is
    exactly what Mosaic rejected in the unified kernel's entry stream).
  - The query's true [start, start+len) window is applied ONCE as a mask
    written back to scratch (no in-register rotation), built from
    scalar-prefetched segment bounds.
  - k2 iterations of (row max, first-hit index, clear): exact f32 values,
    and "first hit" = lowest doc id because entries are doc-sorted, which
    reproduces the sort path's canonical (score desc, doc asc) tie order
    BIT-EXACTLY — this kernel is legal on the unguarded wide path, not
    just under the fast-path guard.

The static window W must cover the WORST query of the envelope (pinned via
DeviceIndex.pin_shapes "W"), but the typical query is ~10x smaller; a naive
full-width scan therefore costs as much as the sort it replaces (measured:
W=8192 pin -> ~6 ms, no win). So every extraction phase is unrolled over
1024-entry blocks, each guarded by `pl.when(b < nblk)` where nblk is the
per-PROGRAM live block count computed from the prefetched bounds: programs
whose 32 queries all fit one block (the common case once the host orders
queries by window size) pay 1/9th of the static width. Cross-phase scalars
(the running max, the winning index) travel through small VMEM scratch —
pl.when bodies cannot return values.

Returns (vals f32 [Q, k2], gidx int32 [Q, k2]): exact selection scores and
GLOBAL flat indices (caller gathers doc ids / payloads at gidx). Slots past
a query's live entries have vals == 0 and gidx == 0.

Reference behavior matched: candidate formation feeding the reference's
exact top-k (src/api_engine.cpp:473-505) — this stage only selects
candidates; scores are exact-rescored downstream either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

QB = 32  # queries per grid program (sublane-aligned output block; wider
#          rows amortize the per-program scalar setup and reduce count)
KPAD = 128  # output lane padding (k2 <= KPAD)
_BLK = 1024  # DMA alignment quantum (8 sublanes x 128 lanes of f32)


def _nblk(w_max: int) -> int:
    """1024-blocks per query window: the floor-alignment slack (< 1024)
    plus the longest possible segment (w_max), rounded up."""
    return (w_max + _BLK - 1) // _BLK + 1


def _make_kernel(n_prog: int, nb: int, k2: int):
    def _kernel(
        bounds_ref, scores_ref, vals_ref, idx_ref,
        xa_ref, xb_ref, m_ref, j_ref, sems_ref,
    ):
        import jax.experimental.pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        p = pl.program_id(0)
        nrows = scores_ref.shape[0]

        def sblk_of(q):
            start = bounds_ref[q]
            # clamp so the nb-block window stays in bounds; the mask keeps
            # correctness (off below absorbs the clamp shift)
            return jnp.minimum(start // _BLK, nrows - nb)

        def start_copies(x_ref, slot, pp):
            for i in range(QB):
                q = pp * QB + i
                pltpu.make_async_copy(
                    scores_ref.at[pl.ds(sblk_of(q), nb)],
                    x_ref.at[i],
                    sems_ref.at[slot, i],
                ).start()

        def wait_copies(x_ref, slot):
            for i in range(QB):
                # dummy descriptor with the same shape/sem: wait only
                pltpu.make_async_copy(
                    scores_ref.at[pl.ds(0, nb)],
                    x_ref.at[i],
                    sems_ref.at[slot, i],
                ).wait()

        @pl.when(p == 0)
        def _():
            start_copies(xa_ref, 0, 0)

        @pl.when((p + 1 < n_prog) & (p % 2 == 0))
        def _():
            start_copies(xb_ref, 1, p + 1)

        @pl.when((p + 1 < n_prog) & (p % 2 == 1))
        def _():
            start_copies(xa_ref, 0, p + 1)

        def extract(x_ref, slot):
            wait_copies(x_ref, slot)

            # Per-row scalars -> [QB, 1] columns (off/len/base) via QB
            # static select steps (no vector-from-scalar constructor in
            # Mosaic), plus the program's live block count.
            row = lax.broadcasted_iota(jnp.int32, (QB, 1), 0)
            off_c = jnp.zeros((QB, 1), jnp.int32)
            len_c = jnp.zeros((QB, 1), jnp.int32)
            base_c = jnp.zeros((QB, 1), jnp.int32)
            nblk = jnp.int32(1)
            for i in range(QB):
                q = p * QB + i
                start = bounds_ref[q]
                sblk = sblk_of(q)
                off = start - sblk * _BLK
                ln = bounds_ref[q + 1] - start
                off_c = jnp.where(row == i, off, off_c)
                len_c = jnp.where(row == i, ln, len_c)
                base_c = jnp.where(row == i, sblk * _BLK, base_c)
                nblk = jnp.maximum(nblk, (off + ln + _BLK - 1) // _BLK)

            # window-local column ids of one block, in the block's NATIVE
            # [QB, 8 sublanes, 128 lanes] layout (flat entry s*128+l) — all
            # block math stays 3D; a [QB, 8, 128] -> [QB, 1024] reshape is
            # a sublane-to-lane relayout Mosaic pays real shuffles for.
            col3 = (
                lax.broadcasted_iota(jnp.int32, (QB, 8, _BLK // 8), 1)
                * (_BLK // 8)
                + lax.broadcasted_iota(jnp.int32, (QB, 8, _BLK // 8), 2)
            )
            off3 = off_c[:, :, None]
            len3 = len_c[:, :, None]

            # one masking pass: zero everything outside [off, off+len)
            for b in range(nb):
                blk = x_ref[:, b]
                colg = col3 + b * _BLK
                live = (colg >= off3) & (colg < off3 + len3)
                x_ref[:, b] = jnp.where(live, blk, jnp.float32(0.0))

            kio = lax.broadcasted_iota(jnp.int32, (QB, KPAD), 1)
            vals = jnp.zeros((QB, KPAD), jnp.float32)
            gidx = jnp.zeros((QB, KPAD), jnp.int32)
            big = jnp.int32(2**30)
            mp3 = jp3 = None  # previous winner: cleared lazily below
            for k in range(k2):
                # phase 1: clear the previous winner while computing the
                # new global row max (one block traversal, not two)
                m_ref[:] = jnp.zeros((QB, 128), jnp.float32)
                for b in range(nb):
                    @pl.when(b < nblk)
                    def _(b=b, mp3=mp3, jp3=jp3):
                        blk = x_ref[:, b]
                        if mp3 is not None:
                            sel = (blk == mp3) & (col3 + b * _BLK == jp3)
                            blk = jnp.where(sel, jnp.float32(0.0), blk)
                            x_ref[:, b] = blk
                        # staged 2D reductions: rank-1 vectors crash
                        # Mosaic's layout inference (layout.h rank check)
                        mb = jnp.max(
                            jnp.max(blk, axis=2), axis=1, keepdims=True
                        )  # [QB, 1]
                        m_ref[:] = jnp.maximum(
                            m_ref[:], jnp.broadcast_to(mb, (QB, 128))
                        )
                m = m_ref[:, :1]  # [QB, 1]
                m3 = m[:, :, None]
                # phase 2: lowest window-local index attaining the max
                j_ref[:] = jnp.full((QB, 128), big, jnp.int32)
                for b in range(nb):
                    @pl.when(b < nblk)
                    def _(b=b):
                        masked = jnp.where(
                            x_ref[:, b] == m3, col3 + b * _BLK, big
                        )
                        jb = jnp.min(
                            jnp.min(masked, axis=2), axis=1, keepdims=True
                        )  # [QB, 1]
                        j_ref[:] = jnp.minimum(
                            j_ref[:], jnp.broadcast_to(jb, (QB, 128))
                        )
                jstar = j_ref[:, :1]  # [QB, 1]
                mp3, jp3 = m3, jstar[:, :, None]
                g = jnp.where(m > 0, base_c + jstar, 0)
                vals = jnp.where(kio == k, jnp.where(m > 0, m, 0.0), vals)
                gidx = jnp.where(kio == k, g, gidx)
            vals_ref[:] = vals
            idx_ref[:] = gidx

        @pl.when(p % 2 == 0)
        def _():
            extract(xa_ref, 0)

        @pl.when(p % 2 == 1)
        def _():
            extract(xb_ref, 1)

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("Q", "k2", "w_max", "interpret")
)
def per_query_topk_pallas(
    scores_flat: jax.Array,  # f32 [N], N % 1024 == 0, query-contiguous
    bounds: jax.Array,  # int32 [Q + 1], segment starts (bounds[Q] == N ok)
    *,
    Q: int,
    k2: int,
    w_max: int,  # static max entries of any single query's segment
    interpret: bool = False,
):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() != "tpu"
    N = scores_flat.shape[0]
    assert N % _BLK == 0, N
    assert k2 <= KPAD, k2
    nb = _nblk(w_max)
    if nb * _BLK > N:
        # tiny corpora: widen the flat array so the block window fits
        scores_flat = jnp.pad(scores_flat, (0, nb * _BLK - N))
        N = nb * _BLK
    n_prog = (Q + QB - 1) // QB
    qpad = n_prog * QB

    # trailing padded queries: empty segments at N
    bpad = jnp.concatenate(
        [bounds, jnp.full((qpad + 1 - bounds.shape[0],), N, jnp.int32)]
    )
    scores3 = scores_flat.reshape(N // _BLK, 8, _BLK // 8)

    vals, gidx = pl.pallas_call(
        _make_kernel(n_prog, nb, k2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_prog,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((QB, KPAD), lambda p, _b: (p, 0)),
                pl.BlockSpec((QB, KPAD), lambda p, _b: (p, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((QB, nb, 8, _BLK // 8), jnp.float32),
                pltpu.VMEM((QB, nb, 8, _BLK // 8), jnp.float32),
                pltpu.VMEM((QB, 128), jnp.float32),
                pltpu.VMEM((QB, 128), jnp.int32),
                pltpu.SemaphoreType.DMA((2, QB)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((qpad, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((qpad, KPAD), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bpad, scores3)
    return vals[:Q, :k2], gidx[:Q, :k2]


def per_query_topk_xla_ref(scores_flat, bounds, *, Q, k2):
    """Pure-NumPy-ish XLA reference for tests (exact same tie semantics)."""
    N = scores_flat.shape[0]
    seg = (
        jnp.searchsorted(
            bounds[1:], jnp.arange(N, dtype=jnp.int32), side="right"
        )
    ).astype(jnp.int32)
    neg = jnp.where(scores_flat > 0, -scores_flat, jnp.float32(jnp.inf))
    gi = jnp.arange(N, dtype=jnp.int32)
    q2, neg2, gi2 = lax.sort(
        (jnp.where(scores_flat > 0, seg, Q).astype(jnp.int32), neg, gi),
        num_keys=3,
    )
    pos = jnp.searchsorted(q2, jnp.arange(Q, dtype=jnp.int32))
    idx = pos[:, None] + lax.broadcasted_iota(jnp.int32, (Q, k2), 1)
    in_q = (
        idx
        < jnp.searchsorted(q2, jnp.arange(1, Q + 1, dtype=jnp.int32))[:, None]
    )
    idx = jnp.clip(idx, 0, N - 1)
    liveq = in_q & (neg2[idx] < jnp.inf)
    vals = jnp.where(liveq, -neg2[idx], 0.0)
    gidx = jnp.where(liveq, gi2[idx], 0)
    return vals, gidx
