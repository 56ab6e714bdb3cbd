"""On-device index finalization: dense rows + bucket tables from postings.

The hybrid posting representation needs three derived structures per corpus:
the heavy dense score rows (bf16 [ND+1pad, n_slots]), the heavy bucket-
position table (int32 [ND+1pad, NBh+1]) and the light bucket-position table
(int32 [NL+1, NBl+1]). Building them host-side at 1M-doc scale materializes
a 12GB f32 matrix and ships ~6.6GB through the host->device link — ~45 min
through the tunneled TPU this repo benches on (measured: single-digit MB/s).
All three are pure functions of the (already device-resident) posting arrays
plus a few KB of per-row (start, df) metadata, so this module computes them
on device instead: expand per-row posting ranges with a searchsorted-over-
cumsum (the same trick ops/bm25.expand_chunks uses), then one scatter for
the dense rows and one scatter-add + cumsum per bucket table. ~30M scatter
updates ≈ seconds; the upload shrinks to the posting arrays the index needs
anyway.

The dense scatter DONATES its zero-initialized output buffer (a 6GB array
at 1M docs): without donation XLA double-buffers the scatter and the build
OOMs a 16GB v5e (measured: 16.62G requested). The bucket pass runs as a
separate small jit program for the same reason.

Returns match the host path bit-for-bit: dense values are the f32 eager
scores cast to bf16 (round-to-nearest-even both sides), bucket positions
are prefix sums of bucket occupancy counts = np.searchsorted of the bucket
bounds. A regression test asserts equality against the host builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.bm25_sparse import BUCKET_LOG2, LIGHT_BUCKET_LOG2


def _expand_rows(row_starts, row_dfs, total_pad, n_rows_pad, P, n_slots,
                 post_doc):
    """Per-posting (sacrificial row id, posting pos, safe doc, valid) for
    concatenated per-row ranges [start_r, start_r + df_r), padded to
    total_pad. Padding entries map to row n_rows_pad - 1, doc n_slots - 1."""
    cum = jnp.cumsum(row_dfs)
    total = cum[-1]
    iota = lax.broadcasted_iota(jnp.int32, (total_pad,), 0)
    row = jnp.searchsorted(cum, iota, side="right").astype(jnp.int32)
    rown = jnp.clip(row, 0, max(row_dfs.shape[0] - 1, 0))
    within = iota - (cum[rown] - row_dfs[rown])
    pos = jnp.clip(row_starts[rown] + within, 0, max(P - 1, 0))
    valid = iota < total
    doc = jnp.clip(post_doc[pos], 0, n_slots - 1)
    srow = jnp.where(valid, rown, n_rows_pad - 1)
    sdoc = jnp.where(valid, doc, n_slots - 1)
    return srow, pos, sdoc, valid


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_pad", "n_slots", "total_pad", "bucket_log2"),
)
def _build_buckets(
    post_doc,
    row_starts,
    row_dfs,
    *,
    n_rows_pad: int,
    n_slots: int,
    total_pad: int,
    bucket_log2: int,
):
    """(bucket_pos int32 [n_rows_pad, NB+1], max bucket occupancy int32)."""
    nb = (n_slots + (1 << bucket_log2) - 1) >> bucket_log2
    P = post_doc.shape[0]
    srow, _pos, sdoc, valid = _expand_rows(
        row_starts, row_dfs, total_pad, n_rows_pad, P, n_slots, post_doc
    )
    cnt = jnp.zeros((n_rows_pad, nb), jnp.int32)
    cnt = cnt.at[srow, sdoc >> bucket_log2].add(
        jnp.where(valid, 1, 0).astype(jnp.int32)
    )
    bucket_pos = jnp.concatenate(
        [jnp.zeros((n_rows_pad, 1), jnp.int32), jnp.cumsum(cnt, axis=1)],
        axis=1,
    )
    # The sacrificial row absorbed the padding writes; keep it all-zero
    # (the kernels' sentinel row) and out of the occupancy maximum.
    bucket_pos = bucket_pos.at[n_rows_pad - 1, :].set(0)
    max_occ = (
        jnp.max(cnt[: n_rows_pad - 1]) if n_rows_pad > 1 else jnp.int32(0)
    )
    return bucket_pos, max_occ


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_pad", "n_slots", "total_pad", "dtype"),
)
def _scatter_dense(
    post_doc,
    post_score,
    row_starts,
    row_dfs,
    *,
    n_rows_pad: int,
    n_slots: int,
    total_pad: int,
    dtype,
):
    """Scatter the dense rows into a zero buffer created IN-program.

    The zeros have exactly one use (the scatter operand), so XLA's buffer
    assignment reuses them in place — peak HBM is one dense array plus the
    ~1.5GB expansion intermediates. Donating an externally-created buffer
    does NOT achieve this through the AOT remote-compile path (measured:
    16.3G requested on a 15.75G v5e), nor does fusing the bucket pass into
    the same program (16.6G) — this program must stay minimal.
    """
    P = post_doc.shape[0]
    srow, pos, sdoc, valid = _expand_rows(
        row_starts, row_dfs, total_pad, n_rows_pad, P, n_slots, post_doc
    )
    score = jnp.where(valid, post_score[pos], jnp.float32(0.0))
    dense = jnp.zeros((n_rows_pad, n_slots), dtype)
    dense = dense.at[srow, sdoc].set(score.astype(dtype))
    # Padding writes landed on the sacrificial last row; real rows are
    # < R <= n_rows_pad - 1 (caller guarantees one spare row, the all-zero
    # sentinel the kernels rely on).
    return dense.at[n_rows_pad - 1, :].set(jnp.asarray(0, dtype))


def _round_pad(n: int, m: int = 1 << 20) -> int:
    return max(((n + m - 1) // m) * m, m)


def build_heavy_on_device(post_doc, post_score, starts, dfs, *, n_rows_pad,
                          n_slots, bf16: bool, with_buckets: bool = True):
    """Dense rows (+ heavy bucket table when with_buckets) on device.

    starts/dfs: host int arrays, one entry per dense row (row id order).
    n_rows_pad must leave the final row unused (zero sentinel row).
    """
    dt = jnp.bfloat16 if bf16 else jnp.float32
    nb = (n_slots + (1 << BUCKET_LOG2) - 1) >> BUCKET_LOG2
    if dfs.size == 0:
        return (
            jnp.zeros((n_rows_pad, n_slots), dt),
            jnp.zeros((n_rows_pad, nb + 1), jnp.int32)
            if with_buckets
            else None,
            0,
        )
    total_pad = _round_pad(int(dfs.sum()))
    d_starts = jnp.asarray(starts, jnp.int32)
    d_dfs = jnp.asarray(dfs, jnp.int32)
    # Scatter the dense rows FIRST, while the bucket tables don't exist
    # yet — every other resident byte raises the scatter program's peak.
    dense = _scatter_dense(
        post_doc, post_score, d_starts, d_dfs,
        n_rows_pad=n_rows_pad, n_slots=n_slots, total_pad=total_pad,
        dtype=dt,
    )
    dense.block_until_ready()
    bucket_pos = None
    occ = 0
    if with_buckets:
        bucket_pos, occ_dev = _build_buckets(
            post_doc, d_starts, d_dfs,
            n_rows_pad=n_rows_pad, n_slots=n_slots, total_pad=total_pad,
            bucket_log2=BUCKET_LOG2,
        )
        occ = int(occ_dev)
    return dense, bucket_pos, occ


def build_light_on_device(post_doc, starts, dfs, *, n_rows_pad, n_slots):
    """Light bucket-position table on device (no dense materialization)."""
    nb = (n_slots + (1 << LIGHT_BUCKET_LOG2) - 1) >> LIGHT_BUCKET_LOG2
    if dfs.size == 0:
        return jnp.zeros((n_rows_pad, nb + 1), jnp.int32), 0
    bucket_pos, occ = _build_buckets(
        post_doc,
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(dfs, jnp.int32),
        n_rows_pad=n_rows_pad,
        n_slots=n_slots,
        total_pad=_round_pad(int(dfs.sum())),
        bucket_log2=LIGHT_BUCKET_LOG2,
    )
    return bucket_pos, int(occ)
